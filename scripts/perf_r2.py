"""Round-2 TPU measurements: the deep-overlap (90%) curscan paths.

Compares the generalized sublane kernel (in-VMEM lane-rotation framing,
reads each IQ sample once) against the XLA chain at the reference's
DEFAULT overlap (curScanNonOverlap 0.1, kspecanal.py:45).  (The round-1
pre-framed kernel it beat 2-3x was removed in round 3.)

Usage: python scripts/perf_r2.py [ovl90|wg]
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
    print(f"{label}: {dt*1e3:8.2f} ms  {s/dt/1e9:6.3f} Gsamp/s", flush=True)
    return s / dt


def _oracle_one(re, im, cfg):
    from kspecanal_tpu.config import window_lut
    win = window_lut(cfg.window, cfg.fft_size)
    adj = len(win) / np.sum(win)
    n = cfg.fft_size
    acc = None
    for s in cfg.window_starts:
        z = (re[s:s + n].astype(np.float64)
             + 1j * im[s:s + n].astype(np.float64))
        mag = adj * 2 * np.abs(np.fft.fft(z * win)) / n
        acc = mag if acc is None else (acc + mag) / 2
    return np.fft.fftshift(acc)


def ovl90():
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops import pallas_curscan as pk
    from kspecanal_tpu.ops.spectrum import curscan_batched

    print("# deep-overlap (ovl 0.9) kernels", flush=True)
    for fft, T in [(2048, 512), (16384, 64)]:
        base = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=0.1,
                          cur_scan_cumu_mode="AVG").finalize()
        mk = jax.jit(lambda k, full: jax.random.normal(
            k, (2, T, full), jnp.float32), static_argnums=1)
        planes = mk(jax.random.key(0), base.full_size)
        re, im = planes[0], planes[1]
        for prec in ("HIGHEST", "HIGH", "DEFAULT"):
            cfg = dataclasses.replace(base, tpu_precision=prec)
            tt, wg = pk._auto_tiles_sublane(cfg, T)
            r = meas(jax.jit(lambda r_, i_: pk.curscan_fused_sublane(
                r_, i_, cfg)), re, im,
                f"sublane-roll fft={fft:5d} {prec:7s} (tt={tt},wg={wg})")
            out = pk.curscan_fused_sublane(re[:2], im[:2], cfg)
            ref = _oracle_one(np.asarray(re[0]), np.asarray(im[0]), cfg)
            err = float(np.max(np.abs(np.asarray(out[0]) - ref)
                               / (np.abs(ref) + 1e-12)))
            print(f"    max_rel_err={err:.2e}", flush=True)
        cfg = dataclasses.replace(base, tpu_precision="HIGHEST")
        meas(jax.jit(lambda r_, i_: curscan_batched(r_, i_, cfg)), re, im,
             f"xla-chain    fft={fft:5d}")
        del re, im, planes


def wg_sweep():
    """Window-group / t_tile sensitivity of the rolled sublane kernel."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops import pallas_curscan as pk

    print("# wg/t_tile sweep (ovl 0.9)", flush=True)
    for fft, T, wgs in [(2048, 512, (71, 32, 16, 8)),
                        (16384, 64, (8, 4, 2, 16))]:
        base = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=0.1,
                          cur_scan_cumu_mode="AVG").finalize()
        mk = jax.jit(lambda k, full: jax.random.normal(
            k, (2, T, full), jnp.float32), static_argnums=1)
        planes = mk(jax.random.key(0), base.full_size)
        re, im = planes[0], planes[1]
        for prec in ("HIGHEST", "DEFAULT"):
            cfg = dataclasses.replace(base, tpu_precision=prec)
            for wg in wgs:
                est = pk._vmem_estimate_sublane(cfg, 1, wg)
                if est > 15.5 * 2**20:
                    print(f"  skip wg={wg} ({est/2**20:.1f}MB est)",
                          flush=True)
                    continue
                try:
                    meas(jax.jit(lambda r_, i_, w=wg:
                                 pk.curscan_fused_sublane(r_, i_, cfg,
                                                          t_tile=1, wg=w)),
                         re, im, f"fft={fft:5d} {prec:7s} wg={wg:2d}")
                except Exception as e:
                    print(f"  wg={wg} failed: {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
        del re, im, planes


def small_packed():
    """Packed read-once small-FFT kernel vs direct DFT vs gathered-small."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops import pallas_curscan as pk
    from kspecanal_tpu.ops.spectrum import curscan_direct_batched

    print("# packed small-fft kernels (ovl 0.5)", flush=True)
    for fft, T in [(64, 16384), (128, 8192)]:
        base = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=0.5,
                          cur_scan_cumu_mode="AVG").finalize()
        mk = jax.jit(lambda k, full: jax.random.normal(
            k, (2, T, full), jnp.float32), static_argnums=1)
        planes = mk(jax.random.key(0), base.full_size)
        re, im = planes[0], planes[1]
        for prec in ("HIGHEST", "DEFAULT"):
            cfg = dataclasses.replace(base, tpu_precision=prec)
            tt = pk._auto_t_tile_packed(cfg)
            meas(jax.jit(lambda r_, i_: pk.curscan_fused_packed(
                r_, i_, cfg)), re, im,
                f"packed fft={fft:4d} {prec:7s} (tt={tt})")
            out = pk.curscan_fused_packed(re[:2], im[:2], cfg)
            ref = _oracle_one(np.asarray(re[0]), np.asarray(im[0]), cfg)
            err = float(np.max(np.abs(np.asarray(out[0]) - ref)
                               / (np.abs(ref) + 1e-12)))
            print(f"    max_rel_err={err:.2e}", flush=True)
            meas(jax.jit(lambda r_, i_: curscan_direct_batched(
                r_, i_, cfg)), re, im, f"direct fft={fft:4d} {prec:7s}")
        # packed t_tile sensitivity
        cfg = dataclasses.replace(base, tpu_precision="HIGHEST")
        for tt in (32, 64, 128, 256):
            if T % tt == 0:
                meas(jax.jit(lambda r_, i_, t=tt: pk.curscan_fused_packed(
                    r_, i_, cfg, t_tile=t)), re, im,
                    f"packed fft={fft:4d} HIGHEST tt={tt}")
        del re, im, planes


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ovl90"
    print(f"backend: {jax.default_backend()}", flush=True)
    if which == "ovl90":
        ovl90()
    elif which == "wg":
        wg_sweep()
    elif which == "small":
        small_packed()
