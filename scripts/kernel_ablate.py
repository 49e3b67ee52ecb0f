"""Stage ablation of the 50%-overlap sublane kernel (VERDICT r4 item 2).

Measures the fused sublane curscan at fft2048 / 50% overlap / DEFAULT /
u8 (the production 8-bit path) with individual stages removed
(`curscan_fused_sublane(..., ablate=...)`), reporting MARGINAL rates
(T=4096 -> 8192 differenced — cancels the fixed ~2.9 ms dispatch RPC)
so the numbers are device time, not tunnel floor.

Reading the table: (time(base) - time(variant)) at fixed work is the
cost of the removed stage.  'matmul-only' keeps just the two DFT stages
+ restacks; 'floor' keeps only the u8 decode + frame concat + reduce.

Usage (TPU, background, ONE client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_ablate.py \
      [fft_size] [precision] [u8|f32]
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

VARIANTS = [
    ("base", ()),
    ("no-win", ("win",)),
    ("no-stage1", ("stage1",)),
    ("no-stage2", ("stage2",)),
    ("no-twiddle", ("twiddle",)),
    ("no-sqrt", ("sqrt",)),
    ("no-cumulate", ("cumulate",)),
    ("per-block (no cross-block concat)", ("concat",)),
    ("matmul-only", ("win", "twiddle", "sqrt", "cumulate")),
    ("floor (decode+frame+reduce)",
     ("win", "stage1", "twiddle", "stage2", "sqrt", "cumulate")),
]


def measure(cfg, ablate, t_blocks, u8, iters=5):
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused_sublane

    if u8:
        mk = jax.jit(lambda k: jax.random.randint(
            k, (2, t_blocks, cfg.full_size), 0, 256).astype(jnp.uint8))
    else:
        mk = jax.jit(lambda k: jax.random.normal(
            k, (2, t_blocks, cfg.full_size), jnp.float32))
    planes = mk(jax.random.key(0))
    re, im = planes[0], planes[1]
    # curscan_fused_sublane already returns through the lru-cached
    # jax.jit(call) in _build_sublane — wrapping it again would key a
    # fresh trace per measure() call.
    def fn(a, b):
        return curscan_fused_sublane(a, b, cfg, ablate=ablate)
    out = fn(re, im)
    _ = float(out.ravel()[0])          # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(re, im)
    _ = float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main(fft_size=2048, precision="DEFAULT", dtype="u8"):
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER

    u8 = dtype == "u8"
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft_size,
                     sampling_rate=2.4e6, window=WINDOW_KAISER,
                     cur_scan_non_overlap=0.5, x_res=512,
                     tpu_precision=precision).finalize()
    t_lo, t_hi = 4096, 8192
    w_lo, w_hi = t_lo * cfg.full_size, t_hi * cfg.full_size
    print(f"fft{fft_size} 50% {precision} {dtype}: "
          f"T={t_lo}/{t_hi} marginal ablation "
          f"(num_windows={cfg.num_windows}, full={cfg.full_size})",
          flush=True)
    base_marg = None
    rows = []
    for name, ab in VARIANTS:
        # best-of-2 on each size: tunnel outliers read ~25% low
        lo = min(measure(cfg, ab, t_lo, u8) for _ in range(2))
        hi = min(measure(cfg, ab, t_hi, u8) for _ in range(2))
        marg = (w_hi - w_lo) / (hi - lo) if hi > lo else float("inf")
        rows.append((name, lo, hi, marg))
        if name == "base":
            base_marg = marg
        base_hi = rows[0][2]
        saved = (base_hi - hi) / base_hi * 100
        print(f"  {name:34s} T{t_lo} {lo*1e3:7.2f} ms  T{t_hi} "
              f"{hi*1e3:7.2f} ms  marginal {marg/1e9:6.2f} Gsamp/s  "
              f"(removes {saved:+5.1f}% of base T{t_hi} time)", flush=True)
    print(f"\nbase marginal: {base_marg/1e9:.2f} Gsamp/s", flush=True)


if __name__ == "__main__":
    fft = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    prec = sys.argv[2] if len(sys.argv) > 2 else "DEFAULT"
    dt = sys.argv[3] if len(sys.argv) > 3 else "u8"
    main(fft, prec, dt)
