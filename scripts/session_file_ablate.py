"""Reconcile session_file_u8's stage accounting (VERDICT r4 weak #3).

Runs the bench's file-source session leg with the round-5 sub-stage
instrumentation (acquire.read / acquire.split / acquire.xfer on the
worker thread; acquire-wait, dsp, drain on the main thread) and prints
a table checking that the stages explain the wall.

Reconciliation model (double-buffered loop):
  main-thread wall ~= acquire-wait + dsp + render + drain + loop-overhead
  worker time      ~= acquire.read + acquire.split + acquire.xfer
The worker overlaps the main thread, so the two columns are NOT summed
together; each must individually account for its thread's time.

Usage (TPU, background, one client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/session_file_ablate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kspec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(n_iters=8192, catch_up=2048):
    import tempfile

    import numpy as np
    from kspecanal_tpu import session as sess_mod
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.io import sources

    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048,
                     sampling_rate=2.4e6, window=WINDOW_KAISER,
                     cur_scan_non_overlap=0.5, x_res=512,
                     tpu_precision="HIGHEST").finalize()
    rng = np.random.default_rng(0)
    tmp = tempfile.NamedTemporaryFile(suffix=".iq", delete=False)
    tmp.write(rng.integers(0, 256, 64 * 2 * cfg.full_size,
                           dtype=np.uint8).tobytes())
    tmp.close()
    src, fallback = sources.make_file_source(
        tmp.name, center_freq=cfg.center_freq,
        sample_rate=cfg.sampling_rate, gain=cfg.gain)
    print(f"source: {type(src).__name__}"
          f"{f' (fallback: {fallback})' if fallback else ''}; "
          f"full_size={cfg.full_size} "
          f"({n_iters * cfg.full_size / 1e6:.0f} Msamp total, "
          f"{2 * n_iters * cfg.full_size / 1e6:.0f} MB u8 over the link)",
          flush=True)

    # warmup/compile
    sess = sess_mod.Session(cfg, src, renderer=None, catch_up=catch_up)
    sess_mod.run_zero_span(sess, max_iters=catch_up)

    sess = sess_mod.Session(cfg, src, renderer=None, catch_up=catch_up)
    t0 = time.perf_counter()
    state = sess_mod.run_zero_span(sess, max_iters=n_iters)
    _ = float(state.fft_avg[0])
    wall = time.perf_counter() - t0
    src.close()
    os.unlink(tmp.name)

    w = n_iters * cfg.full_size
    print(f"\nwall {wall:.3f}s = {w / wall / 1e6:.1f} Msamp/s", flush=True)
    t = sess.timer
    main_stages = ["acquire", "dsp", "render", "drain"]
    worker_stages = ["acquire.read", "acquire.split", "acquire.xfer"]
    for group, names in (("main", main_stages), ("worker", worker_stages)):
        tot = 0.0
        for nm in names:
            st = sum(t.times.get(nm, []))
            tot += st
            rate = (t.samples.get(nm, 0) / st / 1e6) if st else 0.0
            print(f"  [{group}] {nm:14s} {st:7.3f}s  {st / wall * 100:5.1f}% "
                  f"of wall  ({rate:.1f} Msamp/s)", flush=True)
        print(f"  [{group}] TOTAL          {tot:7.3f}s  "
              f"{tot / wall * 100:5.1f}% of wall", flush=True)
    acc = sum(sum(t.times.get(nm, [])) for nm in main_stages)
    print(f"\nmain-thread stages explain {acc / wall * 100:.1f}% of wall "
          f"(target >= 95%)", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    main(n, c)
