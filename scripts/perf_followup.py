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


def small_fft_dispatch():
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


def _oracle_curscan(re, im, cfg):
    from kspecanal_tpu.config import window_lut
    win = window_lut(cfg.window, cfg.fft_size)
    adj = len(win) / np.sum(win)
    n = cfg.fft_size
    out = []
    for b in range(re.shape[0]):
        acc = None
        for s in cfg.window_starts:
            z = (re[b, s:s + n].astype(np.float64)
                 + 1j * im[b, s:s + n].astype(np.float64))
            mag = adj * 2 * np.abs(np.fft.fft(z * win)) / n
            acc = mag if acc is None else (acc + mag) / 2
        out.append(np.fft.fftshift(acc))
    return np.stack(out)


def precision_tradeoff():
    """Fused-kernel throughput + accuracy at each tpuPrecision setting."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused

    print("# tpuPrecision x t_tile fused-kernel tradeoff", flush=True)
    rng = np.random.default_rng(7)
    for fft, T, tiles in [(2048, 2048, (4,)), (4096, 1024, (1, 2, 4)),
                          (16384, 256, (1,))]:
        cfg0 = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=0.5).finalize()
        # accuracy input: small host-generated block with a known answer
        a_re = rng.standard_normal((2, cfg0.full_size)).astype(np.float32)
        a_im = rng.standard_normal((2, cfg0.full_size)).astype(np.float32)
        ref = _oracle_curscan(a_re, a_im, cfg0)
        mk = jax.jit(lambda k: jax.random.normal(
            k, (2, T, cfg0.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        for prec in ("HIGHEST", "HIGH", "DEFAULT"):
            cfg = dataclasses.replace(cfg0, tpu_precision=prec)
            got = np.asarray(curscan_fused(jnp.asarray(a_re),
                                           jnp.asarray(a_im), cfg, t_tile=1))
            err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12))
            print(f"  fft={fft} {prec}: max_rel_err={err:.3e}", flush=True)
            for tt in tiles:
                meas(lambda r, i, c=cfg, t=tt: curscan_fused(r, i, c, t),
                     re, im, f"fused fft={fft:5d} {prec:7s} t_tile={tt}")
        del re, im, planes


def sublane_layout():
    """Sublane-layout fused kernel vs the lane layout, across sizes."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import (_auto_tiles_sublane,
                                                  curscan_fused_sublane)

    print("# sublane-layout fused kernel", flush=True)
    rng = np.random.default_rng(7)
    cases = [(512, 4096, ("HIGHEST",)), (1024, 4096, ("HIGHEST",)),
             (2048, 2048, ("HIGHEST", "HIGH", "DEFAULT")),
             (4096, 1024, ("HIGHEST", "DEFAULT")),
             (16384, 256, ("HIGHEST", "DEFAULT"))]
    for fft, T, precs in cases:
        cfg0 = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=0.5).finalize()
        a_re = rng.standard_normal((2, cfg0.full_size)).astype(np.float32)
        a_im = rng.standard_normal((2, cfg0.full_size)).astype(np.float32)
        ref = _oracle_curscan(a_re, a_im, cfg0)
        mk = jax.jit(lambda k: jax.random.normal(
            k, (2, T, cfg0.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        for prec in precs:
            cfg = dataclasses.replace(cfg0, tpu_precision=prec)
            tt, _wg = _auto_tiles_sublane(cfg, T)
            got = np.asarray(curscan_fused_sublane(
                jnp.asarray(a_re), jnp.asarray(a_im), cfg, t_tile=1))
            err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12))
            print(f"  fft={fft} {prec}: max_rel_err={err:.3e} "
                  f"auto_t_tile={tt}", flush=True)
            meas(lambda r, i, c=cfg, t=tt: curscan_fused_sublane(r, i, c, t),
                 re, im, f"sublane fft={fft:5d} {prec:7s} t_tile={tt}")
        del re, im, planes




def dispatch_matrix():
    """Fill the remaining (size, precision, layout) cells for the auto
    dispatch table."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import (curscan_fused,
                                                  curscan_fused_sublane)
    from kspecanal_tpu.ops.spectrum import curscan_direct_batched

    print("# dispatch matrix fill", flush=True)
    cases = [
        (256, 8192, [("sub", 16, "HIGHEST"), ("sub", 16, "DEFAULT"),
                     ("dir", 0, "HIGHEST")]),
        (1024, 4096, [("sub", 8, "HIGH"), ("sub", 8, "DEFAULT")]),
        (2048, 2048, [("sub", 8, "HIGHEST"), ("sub", 8, "HIGH"),
                      ("sub", 8, "DEFAULT")]),
        (4096, 1024, [("sub", 4, "HIGHEST"), ("sub", 2, "HIGH"),
                      ("lane", 2, "HIGH")]),
        (8192, 512, [("lane", 0, "HIGHEST"), ("lane", 0, "DEFAULT"),
                     ("sub", 0, "HIGHEST"), ("sub", 0, "DEFAULT")]),
        (16384, 256, [("sub", 0, "HIGH"), ("lane", 0, "HIGH")]),
    ]
    for fft, T, specs in cases:
        cfg0 = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=0.5).finalize()
        mk = jax.jit(lambda k: jax.random.normal(
            k, (2, T, cfg0.full_size), jnp.float32))
        planes = mk(jax.random.key(0))
        re, im = planes[0], planes[1]
        for layout, tt, prec in specs:
            cfg = dataclasses.replace(cfg0, tpu_precision=prec)
            if layout == "sub":
                fn = lambda r, i, c=cfg, t=tt: curscan_fused_sublane(r, i, c, t)
            elif layout == "lane":
                fn = lambda r, i, c=cfg, t=tt: curscan_fused(r, i, c, t)
            else:
                fn = jax.jit(lambda r, i, c=cfg: curscan_direct_batched(r, i, c))
            try:
                meas(fn, re, im,
                     f"{layout:4s} fft={fft:5d} {prec:7s} t_tile={tt}")
            except Exception as e:
                print(f"{layout} fft={fft} {prec} t_tile={tt}: "
                      f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        del re, im, planes




if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "small"):
        small_fft_dispatch()
    if which in ("all", "precision"):
        precision_tradeoff()
    if which in ("all", "sublane"):
        sublane_layout()
    if which in ("all", "matrix"):
        dispatch_matrix()
