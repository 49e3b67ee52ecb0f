from kspecanal_tpu.cli import main

raise SystemExit(main())
