"""Hardware smoke + marginal rate for the 3M (Karatsuba) complex-matmul
DEFAULT kernels (round 5): parity vs the XLA chain and the float64-class
expectation, plus T=4096->8192 marginal differencing.

Usage (TPU, background, ONE client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/threemult_smoke.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kspec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def marginal(fn, cfg, u8, t_lo=4096, t_hi=8192, iters=5):
    def run(t_blocks):
        if u8:
            mk = jax.jit(lambda k: jax.random.randint(
                k, (2, t_blocks, cfg.full_size), 0, 256).astype(jnp.uint8))
        else:
            mk = jax.jit(lambda k: jax.random.normal(
                k, (2, t_blocks, cfg.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        out = fn(re, im)
        _ = float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(re, im)
        _ = float(out.ravel()[0])
        return (time.perf_counter() - t0) / iters
    lo = min(run(t_lo) for _ in range(2))
    hi = min(run(t_hi) for _ in range(2))
    return (t_hi - t_lo) * cfg.full_size / (hi - lo)


def parity(fn, cfg, u8, t_blocks=64):
    """Max rel err of the kernel vs the float64 NumPy oracle math."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from oracle import oracle_curscan

    from kspecanal_tpu.config import window_lut
    rng = np.random.default_rng(7)
    if u8:
        rb = rng.integers(0, 256, (t_blocks, cfg.full_size), np.uint8)
        ib = rng.integers(0, 256, (t_blocks, cfg.full_size), np.uint8)
        re, im = jnp.asarray(rb), jnp.asarray(ib)
        blocks = (rb.astype(np.float64) - 127.0) + 1j * (
            ib.astype(np.float64) - 127.0)
    else:
        rb = rng.standard_normal((t_blocks, cfg.full_size)).astype(np.float32)
        ib = rng.standard_normal((t_blocks, cfg.full_size)).astype(np.float32)
        re, im = jnp.asarray(rb), jnp.asarray(ib)
        blocks = rb.astype(np.float64) + 1j * ib.astype(np.float64)
    got = np.asarray(fn(re, im))
    win = window_lut(cfg.window, cfg.fft_size)
    worst = 0.0
    for b in range(t_blocks):
        want = oracle_curscan(blocks[b], cfg.fft_size,
                              cfg.cur_scan_non_overlap, win,
                              cfg.cur_scan_cumu_mode)
        rel = np.max(np.abs(got[b] - want) / (np.abs(want) + 1e-6))
        worst = max(worst, rel)
    return worst


def main():
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import (curscan_fused,
                                                  curscan_fused_sublane)

    jobs = [
        ("sublane fft2048 50% DEFAULT u8", 2048, 0.5, "DEFAULT", True,
         "sublane"),
        ("sublane fft2048 50% DEFAULT f32", 2048, 0.5, "DEFAULT", False,
         "sublane"),
        ("sublane fft2048 90% DEFAULT u8 (deep)", 2048, 0.1, "DEFAULT",
         True, "sublane"),
        ("sublane fft2048 50% HIGHEST f32 (4M ctrl)", 2048, 0.5, "HIGHEST",
         False, "sublane"),
        ("sublane fft2048 50% HIGH f32 (3M bf16x3)", 2048, 0.5, "HIGH",
         False, "sublane"),
        ("sublane fft2048 50% HIGH u8", 2048, 0.5, "HIGH", True,
         "sublane"),
        ("lane fft16384 50% DEFAULT f32", 16384, 0.5, "DEFAULT", False,
         "lane"),
        ("lane fft16384 50% HIGH f32", 16384, 0.5, "HIGH", False,
         "lane"),
    ]
    for name, fft, novl, prec, u8, layout in jobs:
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=novl, x_res=512,
                         tpu_precision=prec).finalize()
        kfn = curscan_fused_sublane if layout == "sublane" else curscan_fused
        fn = jax.jit(lambda a, b, _k=kfn, _c=cfg: _k(a, b, _c))
        err = parity(fn, cfg, u8)
        t_hi = 1024 if fft >= 16384 else 8192
        rate = marginal(fn, cfg, u8, t_lo=t_hi // 2, t_hi=t_hi)
        print(f"{name:44s} max_rel_err {err:.2e}  "
              f"marginal {rate / 1e9:6.2f} Gsamp/s", flush=True)


if __name__ == "__main__":
    main()
