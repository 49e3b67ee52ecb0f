"""Follow-up TPU measurements (run when the chip is reachable):
1. direct-DFT vs XLA chain at small fft sizes (auto-dispatch validation)
2. Precision.HIGH vs HIGHEST in the fused kernel (speed/accuracy)

Usage: python scripts/perf_followup.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def meas(f, re, im, label, iters=10):
    out = f(re, im)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(re, im)
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    s = re.shape[0] * re.shape[1]
    print(f"{label}: {dt*1e3:7.2f} ms  {s/dt/1e9:6.2f} Gsamp/s", flush=True)
    return s / dt


def main():
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.spectrum import (curscan_batched,
                                            curscan_direct_batched)

    print("# direct DFT vs XLA chain (small fft)", flush=True)
    for fft, T in [(64, 8192), (128, 8192), (256, 4096), (512, 4096)]:
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=0.5,
                         cur_scan_cumu_mode="AVG").finalize()
        mk = jax.jit(lambda k: jax.random.normal(
            k, (2, T, cfg.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        meas(jax.jit(lambda r, i: curscan_direct_batched(r, i, cfg)),
             re, im, f"direct fft={fft:4d} T={T}")
        meas(jax.jit(lambda r, i: curscan_batched(r, i, cfg)),
             re, im, f"xla    fft={fft:4d} T={T}")
        del re, im, planes


if __name__ == "__main__":
    main()
