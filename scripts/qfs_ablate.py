"""quickFullScan sweep ablation (round 5): the full chain benches at
6.4 Gsamp/s u8 DEFAULT while the packed fft64 kernel alone reads
10+ Gsamp/s — attribute the gap across band curscans, the lax.scan'd
1225-band stitch, and the heatmap/assembly epilogue.

Usage (TPU, background, ONE client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/qfs_ablate.py [S]
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


def meas(f, *args, label="", iters=5, samples=0):
    out = f(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    best = None
    for _ in range(2):                     # best-of-2: tunnel outliers
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best*1e3:8.2f} ms  {samples/best/1e9:6.3f} Gsamp/s",
          flush=True)
    return best


def main(s=128):
    from kspecanal_tpu.cli import parse_args
    from kspecanal_tpu.models import scan as scan_mod

    print(f"backend={jax.default_backend()}", flush=True)
    cfg, _ = parse_args(["quickFullScan", "tpuPrecision", "DEFAULT"])
    plan = scan_mod.make_scan_plan(cfg)
    b = plan.num_bands
    n = s * b * cfg.full_size
    mk = jax.jit(lambda k: jax.random.randint(
        k, (2, s, b, cfg.full_size), 0, 256).astype(jnp.uint8))
    planes = mk(jax.random.key(0))
    re, im = planes[0], planes[1]
    oks = jnp.ones((s, b), bool)
    state = scan_mod.init_state(cfg, plan)
    print(f"bands={b} sweeps={s} full={cfg.full_size} "
          f"({n/1e6:.0f} Msamp/dispatch)", flush=True)

    # 1) band curscans + display chain only (the packed-kernel leg)
    f_spec = jax.jit(lambda r, i, o: scan_mod.band_spectra(
        r.reshape(s * b, -1), i.reshape(s * b, -1), o.reshape(s * b), cfg))
    t_spec = meas(f_spec, re, im, oks, label="curscans+disp", samples=n)

    # 2) full sweep_steps (curscans + stitch + heatmap)
    t_full = meas(
        lambda r, i, o: scan_mod.sweep_steps_jit(state, r, i, o, cfg, plan),
        re, im, oks, label="sweep_steps  ", samples=n)

    # 3) stitch alone on precomputed spectra
    spectra = f_spec(re, im, oks).reshape(s, b, cfg.fft_size)
    _ = float(spectra.ravel()[0])
    tbl = scan_mod._gather_stitch_plan(cfg, plan)
    f_st = jax.jit(lambda sp: scan_mod._stitch_sweeps_gathered(
        state, sp, cfg, plan, tbl, None))
    t_st = meas(f_st, spectra, label="stitch alone ", samples=n)

    print(f"\nstitch+assembly overhead: {(t_full - t_spec)*1e3:.2f} ms "
          f"({(t_full - t_spec)/t_full*100:.0f}% of the full dispatch); "
          f"isolated stitch {t_st*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
