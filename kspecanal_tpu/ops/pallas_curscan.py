"""Fused Pallas curscan kernel: the whole windowed-FFT chain in VMEM.

Both XLA's FFT and the unfused MXU matmul-FFT plateau at ~4.5 Gsamp/s on
this chip because every stage round-trips HBM (~350 GB/s measured).  This
kernel performs, per IQ block, entirely in VMEM:

    overlapped framing -> window multiply -> two-factor matmul DFT
    (ops/mxu_fft.py decomposition) -> twiddle -> magnitude -> per-window
    cumulate reduction

reading each IQ sample once (8 bytes of float32 planes) and writing only
the reduced ``fft_size`` spectrum per block — the memory-roofline optimum
for this computation.  The final (k1,k2) -> k reorder + fftshift runs in
XLA on the tiny output (Mosaic cannot reshape the lane dimension).

Key layout trick: with N = N1*N2 and every window start divisible by N2,
viewing the IQ block as ``(full_size/N2, N2)`` makes each frame's DFT
input matrix ``A[n1, n2] = x[n1*N2 + n2]`` a contiguous row-slice of the
view — framing costs zero data movement.  Fractional-hop configs whose
starts misalign fall back to the XLA chain (``supports_fused``).

Numerics are identical to ops.spectrum.curscan (same truncated window
starts, winAdj*2/N normalization, closed-form decay weights); golden
tests compare against the float64 oracle.  interpret=True on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from kspecanal_tpu.config import (CUMU_AVG, CUMU_MAX, CUMU_MIN, CUMU_RAW,
                                  SpecConfig, cumu_weights, win_adj,
                                  window_lut)
from kspecanal_tpu.ops.mxu_fft import _dft_tables, _factorize


def supports_fused(cfg: SpecConfig) -> bool:
    """True when every window start is N2-aligned (uniform-hop configs with
    hop % N2 == 0) and N factors into a 2D DFT."""
    n1, n2 = _factorize(cfg.fft_size)
    if n2 == 1:
        return False
    return all(s % n2 == 0 for s in cfg.window_starts)


# Stage-2 runs as ONE block-diagonal matmul when the (W*n2)^2 operand fits
# comfortably in VMEM; above this, per-window dots (already MXU-bound at
# large n1/n2, e.g. 128x128 for fft 16384).  960x960 (fft 4096) crashes the
# Mosaic compiler on this backend, hence the conservative cap.
_BLOCKDIAG_MAX_DIM = 512


def _kernel(re_ref, im_ref, f1r_ref, f1i_ref, f2bdr_ref, f2bdi_ref,
            twr_ref, twi_ref, winr_ref, out_re_ref, *, cfg: SpecConfig,
            weights, use_blockdiag: bool):
    n = cfg.fft_size
    n1, n2 = _factorize(n)
    w_cnt = cfg.num_windows
    adj_scale = win_adj(cfg.window, n) * 2.0 / n
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    win2 = winr_ref[...]                      # (n1, n2) window view

    # --- framing: lane-concat all windows -> A_all (n1, W*n2); stage 1 is
    # then ONE matmul for the whole block instead of W small ones.
    frames_re, frames_im = [], []
    for s in cfg.window_starts:
        r = s // n2
        frames_re.append(re_ref[0, r:r + n1, :] * win2)
        frames_im.append(im_ref[0, r:r + n1, :] * win2)
    ar = jnp.concatenate(frames_re, axis=1)   # (n1, W*n2)
    ai = jnp.concatenate(frames_im, axis=1)

    br = dot(f1r, ar) - dot(f1i, ai)          # stage 1 (contract n1)
    bi = dot(f1r, ai) + dot(f1i, ar)

    twr, twi = twr_ref[...], twi_ref[...]     # pre-tiled (n1, W*n2)
    cr = br * twr - bi * twi                  # twiddle
    ci = br * twi + bi * twr

    if use_blockdiag:
        # stage 2 for all windows at once: C (n1, W*n2) @ F2bd (W*n2, W*n2)
        f2bdr, f2bdi = f2bdr_ref[...], f2bdi_ref[...]
        dr = dot(cr, f2bdr) - dot(ci, f2bdi)
        di = dot(ci, f2bdr) + dot(cr, f2bdi)
        mag = jnp.sqrt(dr * dr + di * di)     # (n1, W*n2) [k1 ; w,k2]
        mode = cfg.cur_scan_cumu_mode
        if mode == CUMU_MIN:
            acc = jnp.full((n1, n2), jnp.inf, jnp.float32)
        else:
            acc = jnp.zeros((n1, n2), jnp.float32)
        for wi in range(w_cnt):
            m = mag[:, wi * n2:(wi + 1) * n2]
            if mode in (CUMU_AVG, CUMU_RAW):
                acc = acc + jnp.float32(weights[wi] * adj_scale) * m
            elif mode == CUMU_MAX:
                acc = jnp.maximum(acc, jnp.float32(adj_scale) * m)
            else:
                acc = jnp.minimum(acc, jnp.float32(adj_scale) * m)
    else:
        # per-window stage 2 (f2bd refs hold plain F2^T here)
        f2rt, f2it = f2bdr_ref[...], f2bdi_ref[...]
        mode = cfg.cur_scan_cumu_mode
        if mode == CUMU_MIN:
            acc = jnp.full((n1, n2), jnp.inf, jnp.float32)
        else:
            acc = jnp.zeros((n1, n2), jnp.float32)
        for wi in range(w_cnt):
            crw = cr[:, wi * n2:(wi + 1) * n2]
            ciw = ci[:, wi * n2:(wi + 1) * n2]
            dr = dot(crw, f2rt) - dot(ciw, f2it)
            di = dot(ciw, f2rt) + dot(crw, f2it)
            m = jnp.sqrt(dr * dr + di * di)
            if mode in (CUMU_AVG, CUMU_RAW):
                acc = acc + jnp.float32(weights[wi] * adj_scale) * m
            elif mode == CUMU_MAX:
                acc = jnp.maximum(acc, jnp.float32(adj_scale) * m)
            else:
                acc = jnp.minimum(acc, jnp.float32(adj_scale) * m)

    out_re_ref[0, :, :] = acc


@functools.lru_cache(maxsize=32)
def _build(cfg: SpecConfig, interpret: bool):
    n = cfg.fft_size
    n1, n2 = _factorize(n)
    full = cfg.full_size
    w_cnt = cfg.num_windows
    rows = full // n2
    f1r, f1i, f2r, f2i, twr1, twi1 = _dft_tables(n)
    win2 = jnp.asarray(
        window_lut(cfg.window, n).reshape(n1, n2), jnp.float32)
    wts = cumu_weights(cfg.cur_scan_cumu_mode, w_cnt)
    weights = (None if wts is None else tuple(float(x) for x in wts))

    # Twiddle tiled across windows: (n1, W*n2)
    twr = jnp.asarray(np.tile(twr1, (1, w_cnt)), jnp.float32)
    twi = jnp.asarray(np.tile(twi1, (1, w_cnt)), jnp.float32)

    use_blockdiag = (w_cnt * n2) <= _BLOCKDIAG_MAX_DIM
    if use_blockdiag:
        # F2bd[(w*n2 + m), (w*n2 + k2)] = F2[k2, m]  (block-diag of F2^T)
        bd = w_cnt * n2
        f2bdr = np.zeros((bd, bd), np.float32)
        f2bdi = np.zeros((bd, bd), np.float32)
        for w in range(w_cnt):
            f2bdr[w * n2:(w + 1) * n2, w * n2:(w + 1) * n2] = f2r.T
            f2bdi[w * n2:(w + 1) * n2, w * n2:(w + 1) * n2] = f2i.T
        f2a, f2b = jnp.asarray(f2bdr), jnp.asarray(f2bdi)
        f2shape = (bd, bd)
    else:
        f2a, f2b = jnp.asarray(f2r.T), jnp.asarray(f2i.T)
        f2shape = (n2, n2)

    kernel = functools.partial(_kernel, cfg=cfg, weights=weights,
                               use_blockdiag=use_blockdiag)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    flops_mm = 8 * n * (n1 + n2) * w_cnt

    def call(iq_re, iq_im):
        t = iq_re.shape[0]
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n1, n2), jnp.float32),
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, rows, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, rows, n2), lambda i: (i, 0, 0)),
                whole((n1, n1)), whole((n1, n1)),
                whole(f2shape), whole(f2shape),
                whole((n1, w_cnt * n2)), whole((n1, w_cnt * n2)),
                whole((n1, n2)),
            ],
            out_specs=pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0)),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=t * (flops_mm + 12 * w_cnt * n),
                bytes_accessed=t * (full * 8 + n * 4),
                transcendentals=t * w_cnt * n,
            ),
        )(iq_re.reshape(t, rows, n2), iq_im.reshape(t, rows, n2),
          jnp.asarray(f1r), jnp.asarray(f1i), f2a, f2b, twr, twi, win2)
        # X[k1 + N1*k2] = acc[k1, k2] -> natural order + fftshift (XLA side;
        # output is tiny next to the IQ input)
        spec = acc.transpose(0, 2, 1).reshape(t, n)
        return jnp.fft.fftshift(spec, axes=-1)

    return jax.jit(call)


def curscan_fused(iq_re: jax.Array, iq_im: jax.Array,
                  cfg: SpecConfig) -> jax.Array:
    """Batched fused curscan: (T, full_size) planes -> (T, fft_size)
    linear fftshifted spectra (one reduced spectrum per block).

    Requires ``supports_fused(cfg)``; runs interpret=True off-TPU so the
    same code path is testable on the CPU mesh.
    """
    if not supports_fused(cfg):
        raise ValueError("config not supported by fused kernel "
                         "(misaligned window starts or prime fft_size)")
    interpret = jax.default_backend() != "tpu"
    return _build(cfg, interpret)(iq_re, iq_im)
