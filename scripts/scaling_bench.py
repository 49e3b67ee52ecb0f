"""Multi-device scaling-efficiency measurement (BASELINE.md: >=80% samples/s
scaling at 1 chip / 1 host / N hosts).

Runs the sharded streaming waterfall over 1..num_devices shards of the
'time' mesh axis and reports samples/s + efficiency vs linear scaling.
On this single-chip environment it exercises the virtual CPU mesh (a
correctness/plumbing check); on a pod slice it measures real ICI scaling.

Usage: [XLA_FLAGS=--xla_force_host_platform_device_count=8] \
       python scripts/scaling_bench.py [fft_size] [blocks_per_device]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# When a virtual CPU mesh is requested, env JAX_PLATFORMS alone is NOT
# honored (the axon TPU plugin overrides it and can hang backend init);
# the in-process config update is the only reliable pin.
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(fft_size=2048, blocks_per_dev=64, json_out=""):
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.parallel.mesh import make_mesh
    from kspecanal_tpu.parallel.stream import waterfall_stream_sharded

    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft_size,
                     sampling_rate=2.4e6, window=WINDOW_KAISER,
                     cur_scan_non_overlap=0.5, x_res=512).finalize()
    n_dev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    base_rate = None
    rows = []
    for s in sizes:
        mesh = make_mesh(time=s)
        t = blocks_per_dev * s
        mk = jax.jit(lambda k: jax.random.normal(
            k, (2, t, cfg.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        res = waterfall_stream_sharded(re, im, cfg, mesh)
        _ = float(res.fft_avg[0])
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            res = waterfall_stream_sharded(re, im, cfg, mesh)
        _ = float(res.fft_avg[0])
        dt = (time.perf_counter() - t0) / iters
        rate = t * cfg.full_size / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * s)
        print(f"shards={s:3d}  {rate/1e9:7.2f} Gsamp/s  "
              f"scaling-efficiency={eff*100:5.1f}%", flush=True)
        rows.append({"shards": s, "samples_per_s": rate,
                     "efficiency_vs_linear": eff})
    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share the SAME physical cores, so "
              "linear scaling is impossible here by construction; the "
              "meaningful signal is that TOTAL throughput stays flat as "
              "shards are added (collective/halo overhead ~0). Real "
              "scaling-efficiency needs a multi-chip slice over ICI.",
              flush=True)
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({"backend": jax.default_backend(), "rows": rows}, f)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    jout = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--json=")), "")
    fft = int(args[0]) if len(args) > 0 else 2048
    bpd = int(args[1]) if len(args) > 1 else 64
    main(fft, bpd, jout)
