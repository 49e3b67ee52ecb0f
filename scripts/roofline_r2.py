"""Roofline-gap breakdown of the primary fused curscan (VERDICT item 5).

At fft2048 / 50% overlap / DEFAULT precision the sublane kernel measures
~8.3 Gsamp/s while both the HBM read-once bound (350 GB/s / 8 B) and the
bf16 MXU bound (~95 TFLOP/s over the ~63 MFLOP actually issued per block,
block-diag waste included) sit at 24-44 Gsamp/s.  This script measures
where the other ~2/3 goes by running STAGE-ABLATED variants of the same
kernel on the same inputs:

    read     DMA the input blocks, reduce rows (pure HBM streaming)
    frame    + framing row-slices + window multiply + frame reduce (VPU)
    s1       + stage-1 chunked block-diag dots (MXU, contract n1)
    s1tw     + twiddle complex multiply (VPU)
    s2       + stage-2 shared dots (MXU, contract n2=128), reduce |dr|+|di|
    full     + magnitude sqrt + weighted cumulate == production kernel

plus XLA-side references for the two matmul stages in isolation, and the
production `curscan_fused_sublane` for cross-checking.

Usage: python scripts/roofline_r2.py [t_tile ...]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER, cumu_weights, \
    win_adj, window_lut
from kspecanal_tpu.ops.mxu_fft import _dft_tables_for
from kspecanal_tpu.ops.pallas_curscan import (_BD_CHUNK, _SUBLANE_N2,
                                              _bd_dot_left, _make_dot)

FFT = 2048
T = 2048


def _kernel_ablate(re_ref, im_ref, f1bdr_ref, f1bdi_ref, f2tr_ref, f2ti_ref,
                   twr_ref, twi_ref, winr_ref, out_ref, *, cfg: SpecConfig,
                   weights, t_tile: int, cf: int, stage: str):
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    n1 = n // n2
    w_cnt = cfg.num_windows
    adj_scale = win_adj(cfg.window, n) * 2.0 / n
    dot = _make_dot(cfg.tpu_precision)
    win_t = winr_ref[...]
    starts = cfg.window_starts
    wgn1 = w_cnt * n1

    if stage == "read":
        # touch every input row once, reduce into the output tile
        acc_r = jnp.zeros((n1, n2), jnp.float32)
        rows = re_ref.shape[1]
        for b in range(t_tile):
            for q in range(0, rows, n1):
                acc_r = acc_r + re_ref[b, q:q + n1, :] + im_ref[b, q:q + n1, :]
            out_ref[b, :, :] = acc_r
        return

    # framing + window (all starts 128-aligned at 50% overlap)
    ab_re, ab_im = [], []
    for b in range(t_tile):
        vr, vi = re_ref[b], im_ref[b]
        frs = [vr[s // n2:s // n2 + n1, :] for s in starts]
        fis = [vi[s // n2:s // n2 + n1, :] for s in starts]
        ab_re.append(jnp.concatenate(frs, axis=0) * win_t)
        ab_im.append(jnp.concatenate(fis, axis=0) * win_t)
    ar = jnp.concatenate(ab_re, axis=1)       # (W*n1, t_tile*128)
    ai = jnp.concatenate(ab_im, axis=1)

    def reduce_to_out(xr, xi):
        # cheap weighted frame-reduce of whatever the stage produced,
        # restacked per block so the output depends on every element
        for b in range(t_tile):
            if xr.shape[1] == t_tile * n2:    # (wgn1, t*128) layout
                xrb = xr[:, b * n2:(b + 1) * n2]
                xib = xi[:, b * n2:(b + 1) * n2]
            else:                             # (t*wgn1, 128) layout
                xrb = xr[b * wgn1:(b + 1) * wgn1]
                xib = xi[b * wgn1:(b + 1) * wgn1]
            acc = None
            for wi in range(w_cnt):
                t_ = (jnp.float32(weights[wi] * adj_scale)
                      * (xrb[wi * n1:(wi + 1) * n1, :]
                         + xib[wi * n1:(wi + 1) * n1, :]))
                acc = t_ if acc is None else acc + t_
            out_ref[b, :, :] = acc

    if stage == "frame":
        reduce_to_out(ar, ai)
        return

    br, bi = _bd_dot_left(dot, f1bdr_ref[...], f1bdi_ref[...], ar, ai,
                          n1, w_cnt, cf)
    if stage == "s1":
        reduce_to_out(br, bi)
        return

    twr, twi = twr_ref[...], twi_ref[...]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    if stage == "s1tw":
        reduce_to_out(cr, ci)
        return

    c2r = jnp.concatenate(
        [cr[:, b * n2:(b + 1) * n2] for b in range(t_tile)], axis=0)
    c2i = jnp.concatenate(
        [ci[:, b * n2:(b + 1) * n2] for b in range(t_tile)], axis=0)
    f2tr, f2ti = f2tr_ref[...], f2ti_ref[...]
    dr = dot(c2r, f2tr) - dot(c2i, f2ti)
    di = dot(c2i, f2tr) + dot(c2r, f2ti)
    if stage == "s2":
        reduce_to_out(dr, di)
        return

    mag = jnp.sqrt(dr * dr + di * di)
    if stage == "full":
        for b in range(t_tile):
            acc = None
            for wi in range(w_cnt):
                t_ = (jnp.float32(weights[wi] * adj_scale)
                      * mag[b * wgn1 + wi * n1: b * wgn1 + (wi + 1) * n1, :])
                acc = t_ if acc is None else acc + t_
            out_ref[b, :, :] = acc
        return
    raise ValueError(stage)


@functools.lru_cache(maxsize=64)
def build(cfg: SpecConfig, t_tile: int, stage: str):
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    n1 = n // n2
    full = cfg.full_size
    w_cnt = cfg.num_windows
    rows = full // n2
    f1r, f1i, f2r, f2i, twr1, twi1 = _dft_tables_for(n, n1, n2)
    weights = tuple(float(x) for x in
                    cumu_weights(cfg.cur_scan_cumu_mode, w_cnt))
    win_t = np.asarray(np.tile(
        window_lut(cfg.window, n).reshape(n1, n2), (w_cnt, 1)), np.float32)
    twr = np.asarray(np.tile(twr1, (w_cnt, t_tile)), np.float32)
    twi = np.asarray(np.tile(twi1, (w_cnt, t_tile)), np.float32)
    wgn1 = w_cnt * n1
    cf = max(1, min(w_cnt, _BD_CHUNK // n1))
    bd = cf * n1
    f1bdr = np.zeros((bd, bd), np.float32)
    f1bdi = np.zeros((bd, bd), np.float32)
    for w in range(cf):
        f1bdr[w * n1:(w + 1) * n1, w * n1:(w + 1) * n1] = f1r
        f1bdi[w * n1:(w + 1) * n1, w * n1:(w + 1) * n1] = f1i

    kernel = functools.partial(_kernel_ablate, cfg=cfg, weights=weights,
                               t_tile=t_tile, cf=cf, stage=stage)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    def call(iq_re, iq_im):
        t = iq_re.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n1, n2), jnp.float32),
            grid=(t // t_tile,),
            in_specs=[
                pl.BlockSpec((t_tile, rows, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((t_tile, rows, n2), lambda i: (i, 0, 0)),
                whole((bd, bd)), whole((bd, bd)),
                whole((n2, n2)), whole((n2, n2)),
                whole((wgn1, t_tile * n2)), whole((wgn1, t_tile * n2)),
                whole((wgn1, n2)),
            ],
            out_specs=pl.BlockSpec((t_tile, n1, n2), lambda i: (i, 0, 0)),
        )(iq_re.reshape(t, rows, n2), iq_im.reshape(t, rows, n2),
          jnp.asarray(f1bdr), jnp.asarray(f1bdi), jnp.asarray(f2r.T),
          jnp.asarray(f2i.T), jnp.asarray(twr), jnp.asarray(twi),
          jnp.asarray(win_t))

    return jax.jit(call)


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
    return dt


def main():
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused_sublane
    tiles = [int(a) for a in sys.argv[1:]] or [4]
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=FFT, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.5,
                     tpu_precision="DEFAULT",
                     cur_scan_cumu_mode="AVG").finalize()
    print(f"backend={jax.default_backend()} fft={FFT} W={cfg.num_windows} "
          f"full={cfg.full_size} T={T}", flush=True)
    mk = jax.jit(lambda k: jax.random.normal(
        k, (2, T, cfg.full_size), jnp.float32))
    planes = mk(jax.random.key(0))
    re, im = planes[0], planes[1]

    # XLA matmul references (achievable MXU rate at these shapes):
    # stage-2 volume as one giant dot, DEFAULT precision
    n1 = FFT // _SUBLANE_N2
    rows_total = T * cfg.num_windows * n1
    a = jax.jit(lambda k: jax.random.normal(
        k, (rows_total, 128), jnp.float32))(jax.random.key(1))
    b = jax.jit(lambda k: jax.random.normal(
        k, (128, 128), jnp.float32))(jax.random.key(2))
    d1 = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT)
    f4 = jax.jit(lambda x, y: (d1(x, y), d1(x, y * 2), d1(x * 2, y),
                               d1(x * 3, y)))
    out = f4(a, b); _ = float(out[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = f4(a, b)
    _ = float(out[0][0, 0])
    dt = (time.perf_counter() - t0) / 10
    fl = 4 * 2 * rows_total * 128 * 128
    print(f"xla stage2-shape 4x dot: {dt*1e3:8.2f} ms  "
          f"{fl/dt/1e12:5.2f} TFLOP/s", flush=True)

    for tt in tiles:
        print(f"--- t_tile={tt}", flush=True)
        prev = 0.0
        for stage in ("read", "frame", "s1", "s1tw", "s2", "full"):
            try:
                dt = meas(build(cfg, tt, stage), re, im,
                          f"tt={tt} {stage:5s}")
            except Exception as e:
                print(f"tt={tt} {stage}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
                break
            if prev:
                print(f"          delta +{(dt - prev)*1e3:7.2f} ms",
                      flush=True)
            prev = dt
        meas(jax.jit(lambda r_, i_, t=tt: curscan_fused_sublane(
            r_, i_, cfg, t_tile=t)), re, im, f"tt={tt} prod ")


if __name__ == "__main__":
    main()
