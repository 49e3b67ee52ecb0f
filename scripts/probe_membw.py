"""HBM streaming-rate probe: what read bandwidth can ANY implementation
get on this chip/path?  Pins the roofline for the curscan kernels.

Measures (a) XLA full-array reduction (pure read), (b) XLA copy
(read+write), (c) the Pallas read-ablation kernel from roofline_r2, each
at several T to split fixed dispatch overhead from marginal bandwidth.
"""
import functools
import sys
import time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

def meas(f, *args, iters=10, bytes_moved=0, label=""):
    out = f(*args)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:8.3f} ms  {bytes_moved/dt/1e9:7.1f} GB/s",
          flush=True)
    return dt

def main():
    print(f"backend={jax.default_backend()}", flush=True)
    full = 16384
    for T in (1024, 2048, 4096):
        nbytes = 2 * T * full * 4
        mk = jax.jit(lambda k, t=T: jax.random.normal(
            k, (2, t, full), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        # (a) pure read: sum both planes
        f_sum = jax.jit(lambda r, i: jnp.sum(r) + jnp.sum(i))
        meas(f_sum, re, im, bytes_moved=nbytes, label=f"T={T} xla sum      ")
        # (a2) row-wise reduce (closer shape to kernel output)
        f_row = jax.jit(lambda r, i: (jnp.sum(r, axis=1) + jnp.sum(i, axis=1)))
        meas(f_row, re, im, bytes_moved=nbytes, label=f"T={T} xla row-sum  ")
        # (b) copy: read+write
        f_cp = jax.jit(lambda r, i: r * 1.000001 + i)
        meas(f_cp, re, im, bytes_moved=nbytes + nbytes // 2,
             label=f"T={T} xla axpy     ")
        del re, im, planes
    # (c) pallas read-ablation at multiple T
    from scripts.roofline_r2 import build, FFT
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=FFT, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.5,
                     tpu_precision="DEFAULT",
                     cur_scan_cumu_mode="AVG").finalize()
    for T in (1024, 2048, 4096):
        nbytes = 2 * T * cfg.full_size * 4
        mk = jax.jit(lambda k, t=T: jax.random.normal(
            k, (2, t, cfg.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        for tt in (8,):
            meas(build(cfg, tt, "read"), re, im, bytes_moved=nbytes,
                 label=f"T={T} pallas read tt={tt}")
            meas(build(cfg, tt, "full"), re, im, bytes_moved=nbytes,
                 label=f"T={T} pallas full tt={tt}")
        del re, im, planes

if __name__ == "__main__":
    main()
