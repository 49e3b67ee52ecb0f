"""fm_scan ablation (VERDICT r2 item 7): where does the sweep-batched
dispatch spend its time?  curscans alone vs +gathered stitch vs the
whole sweep_steps_jit, plus the gather cost in isolation.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/kspec_jax_cache")


def meas(f, *args, label="", iters=10, samples=0):
    out = f(*args)
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else
                        jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else
                        jax.tree_util.tree_leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:8.2f} ms  {samples/dt/1e9:6.3f} Gsamp/s",
          flush=True)
    return dt


def main():
    from kspecanal_tpu.cli import parse_args
    from kspecanal_tpu.models import scan as scan_mod
    from kspecanal_tpu.ops.spectrum import curscan_auto_batched

    print(f"backend={jax.default_backend()}", flush=True)
    cfg, _ = parse_args(["fmScan", "fftSize", "2048"])
    plan = scan_mod.make_scan_plan(cfg)
    b = plan.num_bands
    s = 64
    n = s * b * cfg.full_size
    mk = jax.jit(lambda k: jax.random.normal(
        k, (2, s, b, cfg.full_size), jnp.float32))
    planes = mk(jax.random.key(0))
    re, im = planes[0], planes[1]
    oks = jnp.ones((s, b), bool)
    state = scan_mod.init_state(cfg, plan)
    print(f"bands={b} sweeps={s} total={plan.total_entries}", flush=True)

    # 1) band curscans + display chain only
    f_spec = jax.jit(lambda r, i, o: scan_mod.band_spectra(
        r.reshape(s * b, -1), i.reshape(s * b, -1), o.reshape(s * b), cfg))
    meas(f_spec, re, im, oks, label="curscans+disp", samples=n)

    # 2) full sweep_steps (curscans + gathered stitch + heatmap)
    meas(lambda r, i, o: scan_mod.sweep_steps_jit(state, r, i, o, cfg, plan),
         re, im, oks, label="sweep_steps  ", samples=n)

    # 3) stitch alone on precomputed spectra
    spectra = f_spec(re, im, oks).reshape(s, b, cfg.fft_size)
    spectra = jax.block_until_ready(spectra)
    tbl = scan_mod._gather_stitch_plan(cfg, plan)
    f_st = jax.jit(lambda sp: scan_mod._stitch_sweeps_gathered(
        state, sp, cfg, plan, tbl, None))
    meas(f_st, spectra, label="stitch alone ", samples=n)

    # 4) the two column gathers in isolation
    flat = spectra.reshape(s, -1)
    g1 = jnp.asarray(tbl[0]); g2 = jnp.asarray(tbl[2])
    f_g = jax.jit(lambda fl: (jnp.take(fl, g1, axis=1)
                              + jnp.take(fl, g2, axis=1)))
    meas(f_g, flat, label="2 col gathers", samples=n)

    # 5) einsum fold alone
    cur_all = jax.block_until_ready(f_g(flat))
    k = np.arange(s)
    w = np.where(k[None, :] <= k[:, None],
                 2.0 ** -(k[:, None] - k[None, :] + 1.0), 0.0)
    wj = jnp.asarray(w, jnp.float32)
    f_e = jax.jit(lambda c: jnp.einsum(
        "si,it->st", wj, c, precision=jax.lax.Precision.HIGHEST))
    meas(f_e, cur_all, label="einsum fold  ", samples=n)


if __name__ == "__main__":
    main()
