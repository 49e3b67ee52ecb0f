"""Fused Pallas curscan kernel: the whole windowed-FFT chain in VMEM.

Both XLA's FFT and the unfused MXU matmul-FFT plateau at ~4.5 Gsamp/s on
this chip because every stage round-trips HBM (~350 GB/s measured).  This
kernel performs, per IQ block, entirely in VMEM:

    overlapped framing -> window multiply -> two-factor matmul DFT
    (ops/mxu_fft.py decomposition) -> twiddle -> magnitude -> per-window
    cumulate reduction

reading each IQ sample once (8 bytes of float32 planes) and writing only
the reduced ``fft_size`` spectrum per block.  Measured against that
read-once bound (docs/DESIGN.md "Measured roofline"): at DEFAULT
precision the kernel's marginal throughput is ~158 GB/s of input — 63%
of the XLA streaming ceiling measured the same way (~250 GB/s), i.e.
the chain runs within ~1.6x of the best any implementation could do on
this chip; HIGHEST is matmul-pass-bound instead.  The final
(k1,k2) -> k reorder + fftshift runs in XLA on the tiny output (Mosaic
cannot reshape the lane dimension).

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
from kspecanal_tpu.ops.mxu_fft import (_dft_tables, _factorize,
                                       matmul_precision)


def supports_fused(cfg: SpecConfig) -> bool:
    """True when every window start is N2-aligned (uniform-hop configs with
    hop % N2 == 0) and N factors into a 2D DFT."""
    n1, n2 = _factorize(cfg.fft_size)
    if n2 == 1:
        return False
    return all(s % n2 == 0 for s in cfg.window_starts)


# Block-diagonal matmuls waste FLOPs proportionally to their dimension
# (only 1/num_blocks of the operand is nonzero), so they are applied in
# chunks of this many rows/cols: one MXU tile — the sweet spot between
# bd waste (grows with chunk) and matmul-shape efficiency (shrinks
# below 128).  The diagonal pattern repeats, so one chunk-sized table
# serves every chunk; ragged tails take a static top-left slice.
_BD_CHUNK = 128


def _make_dot(precision_name: str):
    """In-kernel dot for the requested tpuPrecision.

    Mosaic's dot lowering only accepts DEFAULT (one bf16 MXU pass) and
    HIGHEST (six passes).  For HIGH we hand-roll the standard bf16x3
    scheme: split each f32 operand into hi+lo bf16 halves and take the
    three highest-order products — half the passes of HIGHEST for ~1e-5
    relative error (vs ~1e-2 at DEFAULT, ~4e-7 at HIGHEST; with the r5
    3M complex form on aligned paths, HIGH measures 3.5e-5 worst-bin on
    hardware — still squarely between the two).
    """
    prec = matmul_precision(precision_name)
    if prec != jax.lax.Precision.HIGH:
        return functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                 precision=prec)
    d1 = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

    def dot3(a, b):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return d1(a_hi, b_hi) + (d1(a_hi, b_lo) + d1(a_lo, b_hi))

    return dot3


def _cumulate_frames(mode: str, adj_scale, parts):
    """Shared per-window cumulate for every kernel layout.

    ``parts`` yields (weight, mag_tile) per window in order; reproduces
    ``data_cumu`` semantics (kspecanal.py:124-147) with the winAdj*2/N
    scale folded in: AVG/RAW = weighted sum (closed-form decay weights),
    MAX/MIN = running extrema (weight ignored).
    """
    acc = None
    for w, m in parts:
        if mode in (CUMU_AVG, CUMU_RAW):
            t = (jnp.float32(w * adj_scale) if isinstance(w, float)
                 else w * jnp.float32(adj_scale)) * m
            acc = t if acc is None else acc + t
        elif mode == CUMU_MAX:
            t = jnp.float32(adj_scale) * m
            acc = t if acc is None else jnp.maximum(acc, t)
        else:
            t = jnp.float32(adj_scale) * m
            acc = t if acc is None else jnp.minimum(acc, t)
    return acc


def _kernel(re_ref, im_ref, f1r_ref, f1i_ref, f2bdr_ref, f2bdi_ref,
            twr_ref, twi_ref, winr_ref, f1s_ref, f2bds_ref, out_re_ref, *,
            cfg: SpecConfig, weights, t_tile: int):
    n = cfg.fft_size
    n1, n2 = _factorize(n)
    w_cnt = cfg.num_windows
    adj_scale = win_adj(cfg.window, n) * 2.0 / n
    dot = _make_dot(cfg.tpu_precision)
    # 3-multiplication complex matmuls at DEFAULT and HIGH (see
    # _bd_dot_left): 3 complex products instead of 4 — 3 MXU passes at
    # DEFAULT, 9 instead of 12 at HIGH (each bf16x3 dot is 3 passes).
    three_mult = cfg.tpu_precision.upper() in ("DEFAULT", "HIGH")
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    win2 = winr_ref[...]                      # (n1, n2) window view

    # --- framing: lane-concat all windows of all t_tile sub-blocks ->
    # A_all (n1, t_tile*W*n2); stage 1 is then ONE matmul for the whole
    # grid step instead of t_tile*W small ones.
    frames_re, frames_im = [], []
    for b in range(t_tile):
        for s in cfg.window_starts:
            r = s // n2
            frames_re.append(re_ref[b, r:r + n1, :] * win2)
            frames_im.append(im_ref[b, r:r + n1, :] * win2)
    ar = jnp.concatenate(frames_re, axis=1)   # (n1, t_tile*W*n2)
    ai = jnp.concatenate(frames_im, axis=1)

    if three_mult:                            # stage 1 (contract n1)
        t1 = dot(f1r, ar)
        t2 = dot(f1i, ai)
        t3 = dot(f1s_ref[...], ar + ai)
        br, bi = t1 - t2, t3 - t1 - t2
    else:
        br = dot(f1r, ar) - dot(f1i, ai)
        bi = dot(f1r, ai) + dot(f1i, ar)

    twr, twi = twr_ref[...], twi_ref[...]     # pre-tiled (n1, t_tile*W*n2)
    cr = br * twr - bi * twi                  # twiddle
    ci = br * twi + bi * twr

    mode = cfg.cur_scan_cumu_mode

    def reduce_mags(mag_b):
        """(n1, W*n2) per-window magnitudes -> (n1, n2) cumulated."""
        return _cumulate_frames(mode, adj_scale, (
            (weights[wi] if weights else 0.0,
             mag_b[:, wi * n2:(wi + 1) * n2]) for wi in range(w_cnt)))

    # Stage 2 (contract n2) in chunked block-diag form: cf2 windows per
    # (cf2*n2)^2 chunk table (see _BD_CHUNK).
    f2bdr, f2bdi = f2bdr_ref[...], f2bdi_ref[...]
    cf2 = max(1, min(w_cnt, _BD_CHUNK // n2))
    wn2 = w_cnt * n2
    for b in range(t_tile):
        crb = cr[:, b * wn2:(b + 1) * wn2]
        cib = ci[:, b * wn2:(b + 1) * wn2]
        mags = []
        for c in range(0, w_cnt, cf2):
            cols = min(cf2, w_cnt - c) * n2
            c0 = c * n2
            f2r_c, f2i_c = f2bdr[:cols, :cols], f2bdi[:cols, :cols]
            crc = crb[:, c0:c0 + cols]
            cic = cib[:, c0:c0 + cols]
            if three_mult:
                t1 = dot(crc, f2r_c)
                t2 = dot(cic, f2i_c)
                t3 = dot(crc + cic, f2bds_ref[:cols, :cols])
                dr, di = t1 - t2, t3 - t1 - t2
            else:
                dr = dot(crc, f2r_c) - dot(cic, f2i_c)
                di = dot(cic, f2r_c) + dot(crc, f2i_c)
            mags.append(jnp.sqrt(dr * dr + di * di))
        mag = mags[0] if len(mags) == 1 else jnp.concatenate(mags, axis=1)
        acc = reduce_mags(mag)                # (n1, W*n2) [k1 ; w,k2]
        out_re_ref[b, :, :] = acc


@functools.lru_cache(maxsize=32)
def _build(cfg: SpecConfig, interpret: bool, t_tile: int = 1):
    n = cfg.fft_size
    n1, n2 = _factorize(n)
    full = cfg.full_size
    w_cnt = cfg.num_windows
    rows = full // n2
    f1r, f1i, f2r, f2i, twr1, twi1 = _dft_tables(n)
    win2 = np.asarray(
        window_lut(cfg.window, n).reshape(n1, n2), np.float32)
    wts = cumu_weights(cfg.cur_scan_cumu_mode, w_cnt)
    weights = (None if wts is None else tuple(float(x) for x in wts))

    # Twiddle tiled across all windows of a grid step: (n1, t_tile*W*n2)
    twr = np.asarray(np.tile(twr1, (1, w_cnt * t_tile)), np.float32)
    twi = np.asarray(np.tile(twi1, (1, w_cnt * t_tile)), np.float32)

    # F2bd[(w*n2 + m), (w*n2 + k2)] = F2[k2, m]: chunked block-diag of
    # F2^T — ONE (cf2*n2)^2 chunk table reused across chunks.
    cf2 = max(1, min(w_cnt, _BD_CHUNK // n2))
    bd = cf2 * n2
    f2bdr = np.zeros((bd, bd), np.float32)
    f2bdi = np.zeros((bd, bd), np.float32)
    for w in range(cf2):
        f2bdr[w * n2:(w + 1) * n2, w * n2:(w + 1) * n2] = f2r.T
        f2bdi[w * n2:(w + 1) * n2, w * n2:(w + 1) * n2] = f2i.T
    f2a, f2b = f2bdr, f2bdi
    f2shape = (bd, bd)
    f1s = f1r + f1i                # 3M sum tables (DEFAULT/HIGH; tiny)
    f2bds = f2bdr + f2bdi

    kernel = functools.partial(_kernel, cfg=cfg, weights=weights,
                               t_tile=t_tile)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    flops_mm = 8 * n * (n1 + n2) * w_cnt

    def call(iq_re, iq_im):
        t = iq_re.shape[0]
        assert t % t_tile == 0, (t, t_tile)
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n1, n2), jnp.float32),
            grid=(t // t_tile,),
            in_specs=[
                pl.BlockSpec((t_tile, rows, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((t_tile, rows, n2), lambda i: (i, 0, 0)),
                whole((n1, n1)), whole((n1, n1)),
                whole(f2shape), whole(f2shape),
                whole((n1, t_tile * w_cnt * n2)),
                whole((n1, t_tile * w_cnt * n2)),
                whole((n1, n2)),
                whole((n1, n1)), whole(f2shape),
            ],
            out_specs=pl.BlockSpec((t_tile, n1, n2), lambda i: (i, 0, 0)),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=t * (flops_mm + 12 * w_cnt * n),
                bytes_accessed=t * (full * 8 + n * 4),
                transcendentals=t * w_cnt * n,
            ),
        )(iq_re.reshape(t, rows, n2), iq_im.reshape(t, rows, n2),
          jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(f2a),
          jnp.asarray(f2b), jnp.asarray(twr), jnp.asarray(twi),
          jnp.asarray(win2), jnp.asarray(f1s), jnp.asarray(f2bds))
        # X[k1 + N1*k2] = acc[k1, k2] -> natural order + fftshift (XLA side;
        # output is tiny next to the IQ input)
        spec = acc.transpose(0, 2, 1).reshape(t, n)
        return jnp.fft.fftshift(spec, axes=-1)

    return jax.jit(call)


# VMEM budget for auto t_tile.  The scoped-vmem limit on this chip is 16MB
# (compile error beyond); budget what a grid step keeps live:
#   inputs      2 planes x 2 pipeline buffers, lane dim padded to 128
#   stage live  ar/ai + br/bi + cr/ci (6 arrays of (n1, t_tile*W*n2) f32),
#               ~1.5x more when HIGH adds bf16 operand splits
#   tables      f1/f2(bd)/twiddle/window (counted per build below)
# Calibrated against hardware: the estimate reproduces the 28.4MB scoped
# allocation Mosaic reported for (4096, t_tile=8) [OOM at 16MB limit], and
# (2048, t_tile=4) at ~12.2MB estimated compiles fine.
_T_TILE_VMEM_BUDGET = 14 * 1024 * 1024


def _vmem_estimate(cfg: SpecConfig, t_tile: int) -> int:
    n1, n2 = _factorize(cfg.fft_size)
    w_cnt = cfg.num_windows
    lanes = max(n2, 128)  # Mosaic pads the lane dim to 128
    rows = cfg.full_size // n2
    inputs = 2 * 2 * t_tile * rows * lanes * 4
    inter = 6 * n1 * (t_tile * w_cnt * n2) * 4
    if cfg.tpu_precision.upper() == "HIGH":
        inter += inter // 2
    if cfg.tpu_precision.upper() in ("DEFAULT", "HIGH"):
        # 3M stage-1 keeps (ar+ai) + t1/t2/t3 live: ~1 extra array of
        # the dominant (n1, t_tile*W*n2) size (3M runs at HIGH too)
        inter += n1 * (t_tile * w_cnt * n2) * 4
    bd = max(1, min(w_cnt, _BD_CHUNK // n2)) * n2
    # f1 re/im + 3M sum table, twiddle pair, f2bd re/im + 3M sum chunk
    tables = 3 * n1 * n1 * 4 + 2 * n1 * t_tile * w_cnt * n2 * 4
    tables += 3 * bd * bd * 4
    return inputs + inter + tables


def _auto_t_tile(cfg: SpecConfig, t: int) -> int:
    for cand in (8, 4, 2, 1):
        if t % cand == 0 and _vmem_estimate(cfg, cand) <= _T_TILE_VMEM_BUDGET:
            return cand
    return 1


def curscan_fused(iq_re: jax.Array, iq_im: jax.Array, cfg: SpecConfig,
                  t_tile: int = 0) -> jax.Array:
    """Batched fused curscan: (T, full_size) planes -> (T, fft_size)
    linear fftshifted spectra (one reduced spectrum per block).

    ``t_tile`` IQ blocks are processed per grid step (0 = auto) to amortize
    the per-step DMA/sequencing overhead; T must divide by it.  Requires
    ``supports_fused(cfg)``; runs interpret=True off-TPU so the same code
    path is testable on the CPU mesh.
    """
    if not supports_fused(cfg):
        raise ValueError("config not supported by fused kernel "
                         "(misaligned window starts or prime fft_size)")
    t = iq_re.shape[0]
    if t_tile <= 0:
        t_tile = _auto_t_tile(cfg, t)
    interpret = jax.default_backend() != "tpu"
    return _build(cfg, interpret, t_tile)(iq_re, iq_im)


# ---------------------------------------------------------------------------
# Sublane-layout variant: frames stacked on SUBLANES, n2 = 128 lanes.
#
# The original layout above picks MXU-friendly DFT factors (n1 up to 128)
# at the cost of a narrow lane dimension (n2 as small as 16), which Mosaic
# pads to 128 lanes in VMEM — 8x input inflation at fft 2048 — and leaves
# every elementwise op at n2/128 lane utilization.  This variant fixes
# n2 = 128:
#
#     A_all  (W*n1, 128)  frames stacked on sublanes (zero-copy row slices
#                         of the natural (full/128, 128) IQ view)
#     B_all = F1bd @ A_all       stage 1: ONE block-diag matmul per grid
#                                step (lane-concat across t_tile blocks)
#     C = B * T                  twiddle, full-lane
#     D = C2 @ F2^T              stage 2: ONE shared matmul — n2 is the
#                                contraction axis, identical for every
#                                frame, so no block-diag needed
#     |D| -> weighted reduce     per (block, window) row-slices
#
# Same FLOP count as the lane layout, but nothing is lane-padded and the
# whole chain runs at full VPU width.  Larger t_tile fits because the
# input is 8x smaller in VMEM.
# ---------------------------------------------------------------------------

_SUBLANE_N2 = 128


def supports_fused_sublane(cfg: SpecConfig) -> bool:
    """fft_size a multiple of 256 (n1 >= 2).  Window starts may be ANY
    static offsets: misaligned starts (fractional hops, e.g. the
    reference-default 90% overlap, kspecanal.py:45,386) are framed
    in-VMEM via a per-residue lane rotation (see ``_shift_lanes``) —
    no HBM frame materialization."""
    n = cfg.fft_size
    if n % _SUBLANE_N2 or n // _SUBLANE_N2 < 2:
        return False
    if cfg.full_size % _SUBLANE_N2:
        return False
    return True


def _shift_lanes(v, r: int, n2: int):
    """Sample-shift a ``(rows, n2)`` row-major block view by ``r`` lanes:
    ``out[a, l] = flat[a*n2 + r + l]`` for a < rows-1.

    This is how a window start ``s = q*n2 + r`` becomes a zero-copy row
    slice: frame rows are ``out[q : q+n1]``.  One lane ROTATION of the
    whole block (VPU, in-VMEM) plus a select against the next row — the
    kernel-side replacement for an XLA framing gather, which at 90%
    overlap would materialize ~10x the input to HBM.
    """
    from jax.experimental.pallas import tpu as pltpu
    rolled = pltpu.roll(v, shift=n2 - r, axis=1)   # [a,l] = v[a,(l+r)%n2]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (v.shape[0] - 1, n2), 1)
    return jnp.where(lane < n2 - r, rolled[:-1], rolled[1:])


def _bd_dot_left(dot, f1r, f1i, ar, ai, n1: int, w_cnt: int, cf: int,
                 f1s=None):
    """Chunked block-diagonal stage-1: B = blockdiag_W(F1) @ A, applied in
    chunks of ``cf`` frames against ONE (cf*n1, cf*n1) chunk table (the
    diagonal pattern repeats).  Block-diag matmul cost scales with the
    square of its dimension, so 128-wide chunks cut the wasted FLOPs vs a
    single (W*n1)^2 operand by ~W*n1/128 while staying MXU-shaped.
    Ragged tails take a static top-left slice of the table.

    ``f1s`` (= F1r + F1i, precomputed host-side) switches the complex
    product to the 3-multiplication form: T1 = F1r@Ar, T2 = F1i@Ai,
    T3 = (F1r+F1i)@(Ar+Ai); Br = T1-T2, Bi = T3-T1-T2 — 3 complex
    products per chunk instead of 4 (the matmuls, not the VPU, bound
    this kernel at DEFAULT/HIGH).  The extra cancellation error in Bi is
    ~eps(dot) * |T1+T2|: inside DEFAULT's ~1e-2 class and (hardware-
    measured, r5) within HIGH's ~1e-5 class too; HIGHEST keeps the
    4-pass form — its near-f32 contract cannot absorb the cancellation."""
    brs, bis = [], []
    for c in range(0, w_cnt, cf):
        rows = min(cf, w_cnt - c) * n1
        r0 = c * n1
        f1r_c = f1r[:rows, :rows]
        f1i_c = f1i[:rows, :rows]
        arc, aic = ar[r0:r0 + rows, :], ai[r0:r0 + rows, :]
        if f1s is not None:
            t1 = dot(f1r_c, arc)
            t2 = dot(f1i_c, aic)
            t3 = dot(f1s[:rows, :rows], arc + aic)
            brs.append(t1 - t2)
            bis.append(t3 - t1 - t2)
        else:
            brs.append(dot(f1r_c, arc) - dot(f1i_c, aic))
            bis.append(dot(f1r_c, aic) + dot(f1i_c, arc))
    if len(brs) == 1:
        return brs[0], bis[0]
    return jnp.concatenate(brs, axis=0), jnp.concatenate(bis, axis=0)


def _kernel_sublane(re_ref, im_ref, f1bdr_ref, f1bdi_ref, f2tr_ref, f2ti_ref,
                    twr_ref, twi_ref, winr_ref, f1bds_ref, f2ts_ref,
                    out_ref, *, cfg: SpecConfig,
                    weights, t_tile: int, cf: int, wg: int, u8: bool,
                    ablate: frozenset = frozenset()):
    """``ablate`` (perf forensics ONLY — scripts/kernel_ablate.py; the
    production dispatcher never sets it) removes stages one at a time to
    attribute kernel time: 'win' (window multiply), 'stage1'/'stage2'
    (the two DFT matmul stages), 'twiddle', 'sqrt' (|.| -> |.|^2),
    'cumulate' (weighted reduce -> plain add), 'concat' (per-block dots,
    no cross-block restacks).  Those stage removals produce WRONG
    spectra by construction (each keeps the same input reads and an
    output write so nothing is dead-code-eliminated).  Two further keys
    override the 3M gate with VALID math: 'force3m' / 'no3m' pick the
    3- or 4-multiplication complex form regardless of the measured
    production gate (used by scripts/ probes and the gate regression
    test)."""
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    n1 = n // n2
    w_cnt = cfg.num_windows
    adj_scale = win_adj(cfg.window, n) * 2.0 / n
    dot = _make_dot(cfg.tpu_precision)
    win_t = winr_ref[...]                     # (wg*n1, 128) per-frame window
    mode = cfg.cur_scan_cumu_mode

    # Per-block views + per-residue lane rotations for misaligned starts,
    # computed ONCE per grid step (the block stays resident in VMEM).
    # u8 inputs (raw 8-bit ADC planes) decode here in VMEM — each HBM
    # sample costs 1 byte/plane instead of 4, which matters because the
    # DEFAULT-precision chain is read-bound (docs/DESIGN.md roofline).
    starts = cfg.window_starts
    residues = sorted({s % n2 for s in starts if s % n2})
    # 3-multiplication complex matmuls (see _bd_dot_left): 25% fewer MXU
    # passes on both DFT stages, using the precomputed sum tables
    # (F1r+F1i bd chunk, (F2r+F2i)^T).  Gate measured per path (r5,
    # deep-overlap = residue configs, marginal Gsamp/s 4M -> 3M):
    #   HIGH: 3M everywhere (deep u8 3.3->4.1, f32 3.1->4.5 — HIGH's
    #     triple-pass dots make even the rotation-heavy path MXU-bound);
    #   DEFAULT aligned: 3M (50% u8 30.0 -> 31.4-39.7);
    #   DEFAULT deep f32: 3M (6.5 -> 7.2);
    #   DEFAULT deep u8: 4M (9.1 -> 7.7 with 3M — the in-VMEM u8 widen
    #     chain already loads the VPU; 3M's operand adds tip it over).
    prec = cfg.tpu_precision.upper()
    three_mult = (prec == "HIGH"
                  or (prec == "DEFAULT" and not (residues and u8)))
    if "force3m" in ablate:      # perf forensics only (scripts/)
        three_mult = True
    elif "no3m" in ablate:
        three_mult = False
    planes = []
    for b in range(t_tile):
        vr, vi = re_ref[b], im_ref[b]
        if u8:
            # Mosaic has no unsigned->float lowering; widen to i32 first
            # (u8->i32 and i32->f32 both lower, lowering.py _convert_helper).
            vr = vr.astype(jnp.int32).astype(jnp.float32) - 127.0
            vi = vi.astype(jnp.int32).astype(jnp.float32) - 127.0
        planes.append((vr, vi))

    # Deep-overlap DEFAULT runs stage the FRAMES in bf16: the MXU casts
    # DEFAULT operands to bf16 at the feed anyway, so casting at the
    # window-multiply halves the frame-concat traffic and feeds the dot
    # natively.  The rotations themselves must stay 32-bit — Mosaic's
    # tpu.dynamic_rotate has no sub-32-bit lowering ("Rotate with
    # non-32-bit data", found on hardware; interpret mode accepts bf16).
    # bf16 staging is gated on RESIDUES (deep overlap) deliberately: on
    # the aligned 50% path the explicit casts only add VPU work where
    # HBM reads bind — measured r4: primary DEFAULT dropped 14.8 -> 13.3
    # f32 / 19.8 -> 17.3 u8 with staging forced on.  Deep overlap's
    # frame volume (~10x input) is where the halved traffic wins.
    lo = cfg.tpu_precision.upper() == "DEFAULT" and bool(residues)
    if residues:
        # ONE rotation per residue over the whole plane stack [re0; im0;
        # re1; im1; ...] instead of 2*t_tile per residue — the rotation/
        # select VPU work is what keeps deep overlap off the matmul
        # bound.  A rotated row borrows its tail lanes from the NEXT
        # stacked row; at plane/block seams that is foreign data, but a
        # misaligned (r != 0) window start implies q + n1 - 1 <= rows-2
        # (s <= full-fft and r > 0), so frames never read a seam row.
        stack = jnp.concatenate([p for pair in planes for p in pair],
                                axis=0)          # (t_tile*2*rows, n2)
        rot = {r: _shift_lanes(stack, r, n2) for r in residues}

    def frame(b, s):
        q, r = divmod(s, n2)
        if r == 0:
            vr, vi = planes[b]
            return vr[q:q + n1, :], vi[q:q + n1, :]
        base = rot[r]
        ro = (2 * b) * (re_ref.shape[1])     # rows per plane
        io = ro + re_ref.shape[1]
        return (base[ro + q:ro + q + n1, :], base[io + q:io + q + n1, :])

    # Window-GROUP loop: wg windows at a time so the stage intermediates
    # stay inside the VMEM budget at deep overlaps (90% -> 71 windows),
    # accumulating per-block partial reductions.  One group == the whole
    # window set for the 50%-overlap configs (no behavior change there).
    acc = [None] * t_tile
    for g0 in range(0, w_cnt, wg):
        gcnt = min(wg, w_cnt - g0)
        gn1 = gcnt * n1
        win_g = (win_t[:gn1].astype(jnp.bfloat16) if lo else win_t[:gn1])
        ab_re, ab_im = [], []
        for b in range(t_tile):
            frs, fis = zip(*(frame(b, starts[g0 + j]) for j in range(gcnt)))
            fr_cat = jnp.concatenate(frs, axis=0)
            fi_cat = jnp.concatenate(fis, axis=0)
            if lo:
                fr_cat = fr_cat.astype(jnp.bfloat16)
                fi_cat = fi_cat.astype(jnp.bfloat16)
            if "win" in ablate:
                ab_re.append(fr_cat)
                ab_im.append(fi_cat)
            else:
                ab_re.append(fr_cat * win_g)
                ab_im.append(fi_cat * win_g)
        if "concat" in ablate:
            # Per-block pipeline, no cross-block restacks: stage-1/2 run
            # once per block at N=128 instead of N=t_tile*128.
            f1r_t, f1i_t = f1bdr_ref[...], f1bdi_ref[...]
            f2tr, f2ti = f2tr_ref[...], f2ti_ref[...]
            f1s_t = f1bds_ref[...] if three_mult else None
            f2ts = f2ts_ref[...] if three_mult else None
            if lo:
                f1r_t, f1i_t = (f1r_t.astype(jnp.bfloat16),
                                f1i_t.astype(jnp.bfloat16))
                f2tr, f2ti = (f2tr.astype(jnp.bfloat16),
                              f2ti.astype(jnp.bfloat16))
                if three_mult:   # DEFAULT deep f32 stages bf16 (lo) + 3M
                    f1s_t = f1s_t.astype(jnp.bfloat16)
                    f2ts = f2ts.astype(jnp.bfloat16)
            mags = []
            for b in range(t_tile):
                arb, aib = ab_re[b], ab_im[b]
                br, bi = _bd_dot_left(dot, f1r_t, f1i_t, arb, aib,
                                      n1, gcnt, cf, f1s=f1s_t)
                twr = twr_ref[:, b * n2:(b + 1) * n2]
                twi = twi_ref[:, b * n2:(b + 1) * n2]
                cr = br * twr[:gn1] - bi * twi[:gn1]
                ci = br * twi[:gn1] + bi * twr[:gn1]
                if lo:
                    cr, ci = cr.astype(jnp.bfloat16), ci.astype(jnp.bfloat16)
                if three_mult:
                    t1 = dot(cr, f2tr)
                    t2 = dot(ci, f2ti)
                    t3 = dot(cr + ci, f2ts)
                    dr, di = t1 - t2, t3 - t1 - t2
                else:
                    dr = dot(cr, f2tr) - dot(ci, f2ti)
                    di = dot(ci, f2tr) + dot(cr, f2ti)
                mags.append(jnp.sqrt(dr * dr + di * di))
            mag = jnp.concatenate(mags, axis=0)
        else:
            ar = jnp.concatenate(ab_re, axis=1)   # (gcnt*n1, t_tile*128)
            ai = jnp.concatenate(ab_im, axis=1)

            f1r_t, f1i_t = f1bdr_ref[...], f1bdi_ref[...]
            f1s_t = f1bds_ref[...] if three_mult else None
            if lo:   # feed the MXU bf16 directly (DEFAULT casts there anyway)
                f1r_t, f1i_t = (f1r_t.astype(jnp.bfloat16),
                                f1i_t.astype(jnp.bfloat16))
                if three_mult:
                    f1s_t = f1s_t.astype(jnp.bfloat16)
            if "stage1" in ablate:
                br, bi = ar, ai
            else:
                br, bi = _bd_dot_left(dot, f1r_t, f1i_t, ar, ai,
                                      n1, gcnt, cf, f1s=f1s_t)

            twr, twi = twr_ref[...], twi_ref[...]  # (wg*n1, t_tile*128)
            if "twiddle" in ablate:
                cr, ci = br, bi
            else:
                cr = br * twr[:gn1] - bi * twi[:gn1]
                ci = br * twi[:gn1] + bi * twr[:gn1]
            if lo and not ("stage1" in ablate and "twiddle" in ablate):
                cr, ci = cr.astype(jnp.bfloat16), ci.astype(jnp.bfloat16)

            # Stage 2 contracts the lane axis; restack blocks on sublanes
            # so it is one matmul against the shared (128, 128) F2^T.
            c2r = jnp.concatenate(
                [cr[:, b * n2:(b + 1) * n2] for b in range(t_tile)], axis=0)
            c2i = jnp.concatenate(
                [ci[:, b * n2:(b + 1) * n2] for b in range(t_tile)], axis=0)
            if "stage2" in ablate:
                dr, di = (c2r.astype(jnp.float32), c2i.astype(jnp.float32))
            else:
                f2tr, f2ti = f2tr_ref[...], f2ti_ref[...]
                f2ts = f2ts_ref[...] if three_mult else None
                if lo:
                    f2tr, f2ti = (f2tr.astype(jnp.bfloat16),
                                  f2ti.astype(jnp.bfloat16))
                    if three_mult:
                        f2ts = f2ts.astype(jnp.bfloat16)
                if three_mult:
                    t1 = dot(c2r, f2tr)               # (t*gcnt*n1, 128)
                    t2 = dot(c2i, f2ti)
                    t3 = dot(c2r + c2i, f2ts)
                    dr, di = t1 - t2, t3 - t1 - t2
                else:
                    dr = dot(c2r, f2tr) - dot(c2i, f2ti)
                    di = dot(c2i, f2tr) + dot(c2r, f2ti)
            if "sqrt" in ablate:
                mag = dr * dr + di * di
            else:
                mag = jnp.sqrt(dr * dr + di * di)

        for b in range(t_tile):
            if "cumulate" in ablate:
                part = sum(mag[b * gn1 + wi * n1: b * gn1 + (wi + 1) * n1, :]
                           for wi in range(gcnt))
            else:
                part = _cumulate_frames(mode, adj_scale, (
                    (weights[g0 + wi] if weights else 0.0,
                     mag[b * gn1 + wi * n1: b * gn1 + (wi + 1) * n1, :])
                    for wi in range(gcnt)))
            if acc[b] is None:
                acc[b] = part
            elif mode in (CUMU_AVG, CUMU_RAW):
                acc[b] = acc[b] + part
            elif mode == CUMU_MAX:
                acc[b] = jnp.maximum(acc[b], part)
            else:
                acc[b] = jnp.minimum(acc[b], part)
    for b in range(t_tile):
        out_ref[b, :, :] = acc[b]


@functools.lru_cache(maxsize=32)
def _build_sublane(cfg: SpecConfig, interpret: bool, t_tile: int = 1,
                   wg: int = 0, u8: bool = False,
                   ablate: frozenset = frozenset()):
    from kspecanal_tpu.ops.mxu_fft import _dft_tables_for
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    n1 = n // n2
    full = cfg.full_size
    w_cnt = cfg.num_windows
    if wg <= 0:
        wg = w_cnt
    rows = full // n2
    f1r, f1i, f2r, f2i, twr1, twi1 = _dft_tables_for(n, n1, n2)
    wts = cumu_weights(cfg.cur_scan_cumu_mode, w_cnt)
    weights = (None if wts is None else tuple(float(x) for x in wts))

    # Tables are sized to one window GROUP (wg windows), not the full
    # window set — deep-overlap configs chunk the window axis in-kernel.
    win_t = np.asarray(np.tile(
        window_lut(cfg.window, n).reshape(n1, n2), (wg, 1)), np.float32)
    # Twiddle: per-frame (n1, n2) tile -> sublane-tile wg x lane-tile t_tile
    twr = np.asarray(np.tile(twr1, (wg, t_tile)), np.float32)
    twi = np.asarray(np.tile(twi1, (wg, t_tile)), np.float32)

    wgn1 = wg * n1
    # Chunked stage-1 block-diag: ONE (cf*n1, cf*n1) chunk table reused
    # across chunks (the diagonal pattern repeats every cf frames).
    cf = max(1, min(wg, _BD_CHUNK // n1))
    bd = cf * n1
    f1bdr = np.zeros((bd, bd), np.float32)
    f1bdi = np.zeros((bd, bd), np.float32)
    for w in range(cf):
        f1bdr[w * n1:(w + 1) * n1, w * n1:(w + 1) * n1] = f1r
        f1bdi[w * n1:(w + 1) * n1, w * n1:(w + 1) * n1] = f1i
    f1a, f1b = f1bdr, f1bdi
    f1shape = (bd, bd)
    # 3M complex-matmul sum tables (DEFAULT/HIGH; tiny, always shipped
    # so the pallas signature stays fixed)
    f1bds = f1bdr + f1bdi
    f2ts_tab = (f2r + f2i).T

    kernel = functools.partial(_kernel_sublane, cfg=cfg, weights=weights,
                               t_tile=t_tile, cf=cf, wg=wg, u8=u8,
                               ablate=ablate)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    flops_mm = 8 * n * (n1 + n2) * w_cnt

    def call(iq_re, iq_im):
        t = iq_re.shape[0]
        assert t % t_tile == 0, (t, t_tile)
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n1, n2), jnp.float32),
            grid=(t // t_tile,),
            in_specs=[
                pl.BlockSpec((t_tile, rows, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((t_tile, rows, n2), lambda i: (i, 0, 0)),
                whole(f1shape), whole(f1shape),
                whole((n2, n2)), whole((n2, n2)),
                whole((wgn1, t_tile * n2)), whole((wgn1, t_tile * n2)),
                whole((wgn1, n2)),
                whole(f1shape), whole((n2, n2)),
            ],
            out_specs=pl.BlockSpec((t_tile, n1, n2), lambda i: (i, 0, 0)),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=t * (flops_mm + 12 * w_cnt * n),
                bytes_accessed=t * (full * 8 + n * 4),
                transcendentals=t * w_cnt * n,
            ),
        )(iq_re.reshape(t, rows, n2), iq_im.reshape(t, rows, n2),
          jnp.asarray(f1a), jnp.asarray(f1b), jnp.asarray(f2r.T),
          jnp.asarray(f2i.T), jnp.asarray(twr), jnp.asarray(twi),
          jnp.asarray(win_t), jnp.asarray(f1bds),
          jnp.asarray(np.asarray(f2ts_tab, np.float32)))
        # X[k1 + N1*k2] = acc[k1, k2] -> natural order + fftshift
        spec = acc.transpose(0, 2, 1).reshape(t, n)
        return jnp.fft.fftshift(spec, axes=-1)

    return jax.jit(call)


def _vmem_estimate_sublane(cfg: SpecConfig, t_tile: int, wg: int = 0,
                           u8: bool = False) -> int:
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    n1 = n // n2
    w_cnt = cfg.num_windows
    if wg <= 0:
        wg = w_cnt
    rows = cfg.full_size // n2
    wgn1 = wg * n1
    if u8:
        # 1 B double-buffered inputs + the decoded f32 block copies
        inputs = 2 * 2 * t_tile * rows * n2 + 2 * t_tile * rows * n2 * 4
    else:
        inputs = 2 * 2 * t_tile * rows * n2 * 4
    # ar/ai + br/bi + cr/ci + c2/mag/d live arrays (per window group)
    inter = 11 * wgn1 * (t_tile * n2) * 4
    # misaligned starts: the concatenated plane stack + one rotated copy
    # per residue (all live across the whole grid step; rotations must
    # stay 32-bit — Mosaic cannot rotate bf16)
    n_res = len({s % n2 for s in cfg.window_starts if s % n2})
    if n_res:
        inter += (n_res + 1) * 2 * t_tile * rows * n2 * 4
    if cfg.tpu_precision.upper() == "HIGH":
        inter += inter // 2
    bd = max(1, min(wg, _BD_CHUNK // n1)) * n1
    tables = 3 * bd * bd * 4                 # f1 re/im + 3M sum chunk
    tables += 3 * n2 * n2 * 4 + 2 * wgn1 * t_tile * n2 * 4 + wgn1 * n2 * 4
    # per-block partial accumulators
    tables += t_tile * n1 * n2 * 4
    return inputs + inter + tables


def _auto_tiles_sublane(cfg: SpecConfig, t: int, u8: bool = False):
    """(t_tile, wg): prefer batching whole blocks with the full window set;
    deep-overlap configs that cannot fit all windows chunk the window axis
    instead (wg < num_windows), keeping the read-input-once property.

    Capped at 8: measured flat from tt=2 to tt=8 (roofline ablation) and
    tt=16 unrolls a kernel body big enough to cost 15+ min of remote
    Mosaic compile for no measured gain."""
    for cand in (8, 4, 2, 1):
        if t % cand == 0 and (_vmem_estimate_sublane(cfg, cand, u8=u8)
                              <= _T_TILE_VMEM_BUDGET):
            return cand, cfg.num_windows
    for wg in (32, 16, 8, 4, 2, 1):
        if wg < cfg.num_windows and (_vmem_estimate_sublane(cfg, 1, wg, u8)
                                     <= _T_TILE_VMEM_BUDGET):
            return 1, wg
    return 1, 1


def curscan_fused_sublane(iq_re: jax.Array, iq_im: jax.Array,
                          cfg: SpecConfig, t_tile: int = 0,
                          wg: int = 0, ablate=()) -> jax.Array:
    """Sublane-layout fused curscan: (T, full_size) -> (T, fft_size)
    fftshifted linear spectra.  Requires ``supports_fused_sublane(cfg)``.

    uint8 inputs are RAW capture planes (value-127 offset,
    octave/load_rtlsdr.m) decoded IN VMEM — 4x less HBM read than float32
    planes, which is the binding limit at DEFAULT precision."""
    if not supports_fused_sublane(cfg):
        raise ValueError("config not supported by sublane fused kernel")
    u8 = iq_re.dtype == jnp.uint8
    t = iq_re.shape[0]
    if t_tile <= 0:
        auto_t, auto_wg = _auto_tiles_sublane(cfg, t, u8)
        t_tile = auto_t
        if wg <= 0:
            wg = auto_wg
    elif wg <= 0:
        wg = cfg.num_windows
    interpret = jax.default_backend() != "tpu"
    return _build_sublane(cfg, interpret, t_tile, wg, u8,
                          frozenset(ablate))(iq_re, iq_im)


# ---------------------------------------------------------------------------
# PACKED small-FFT kernel (fft_size <= 128): read-input-once framing.
#
# The quickFullScan regime (fftSize 64, kspecanal.py:916-921) is
# gather/epilogue-bound in both the direct-DFT and the gathered small
# kernel: the (W, n) frame matrix is ~2-9x the input and round-trips HBM.
# Here the input block is viewed as (full/128, 128) rows and each 128-lane
# row packs 128/n frames side by side:
#
#   * a window start s maps to (view r, row q, slot c) with
#     o = s % 128, r = o % n, c = o // n, q = s // 128 — so only
#     len({s % n}) DISTINCT lane-shifted views of the block are needed
#     (2 at 50% overlap, ~10 at the reference-default 90%), built in-VMEM
#     by _shift_lanes.  Every sample is read from HBM exactly once.
#   * the window LUT and the winAdj*2/N normalization fold INTO the
#     block-diagonal DFT^T table (both scale linearly through |.|), so
#     framing costs nothing beyond the shifts.
#   * slots that correspond to no real window carry weight/mask 0; the
#     per-window cumulate is a weight-table multiply + row reduction +
#     one (128, n) fold matmul (AVG/RAW) or masked extrema + lane-rolls
#     (MAX/MIN).
# ---------------------------------------------------------------------------


def _packed_block_bytes(cfg: SpecConfig) -> int:
    """Estimated VMEM bytes one IQ block keeps live in the packed kernel:
    inputs (2 planes x 2 pipeline buffers) + ar/ai/dr/di/mag/wm/wtbl
    (~9 view-stacked arrays)."""
    n2 = _SUBLANE_N2
    rows = cfg.full_size // n2
    nv = len({(s % n2) % cfg.fft_size for s in cfg.window_starts})
    return (2 * 2 * rows + 9 * nv * rows) * n2 * 4


def supports_fused_packed(cfg: SpecConfig) -> bool:
    n = cfg.fft_size
    if not (n <= _SUBLANE_N2 and _SUBLANE_N2 % n == 0
            and cfg.full_size % _SUBLANE_N2 == 0
            and cfg.full_size >= 2 * _SUBLANE_N2):
        return False
    # Mosaic needs the out-block sublane dim divisible by 8, so t_tile
    # cannot drop below 8 (_auto_t_tile_packed); a config whose 8-block
    # footprint exceeds the scoped-VMEM budget must take another path.
    return 8 * _packed_block_bytes(cfg) <= _T_TILE_VMEM_BUDGET // 2


def _packed_geometry(cfg: SpecConfig):
    """(residues, slot table): windows -> (view, row, slot) coordinates."""
    n = cfg.fft_size
    residues = sorted({(s % _SUBLANE_N2) % n for s in cfg.window_starts})
    slots = []
    for w, s in enumerate(cfg.window_starts):
        o = s % _SUBLANE_N2
        slots.append((residues.index(o % n), s // _SUBLANE_N2, o // n, w))
    return residues, slots


def _kernel_packed(re_ref, im_ref, dtr_ref, dti_ref, w_ref, p_ref, out_ref,
                   *, cfg: SpecConfig, t_tile: int, residues, rows: int,
                   u8: bool):
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    mode = cfg.cur_scan_cumu_mode
    dot = _make_dot(cfg.tpu_precision)
    nv = len(residues)
    tr = t_tile * rows

    def views(ref):
        # ONE shift per residue over the whole (t_tile*rows, n2) stack.
        # A shifted row's tail lanes borrow from the NEXT flat row — at a
        # block boundary that is the next block's data, but those lanes
        # belong only to slots whose implied frame would cross the block
        # end, and such slots carry weight/mask 0 (no valid window there).
        flat = ref[...]                                # (tr, n2) 2-D block
        if u8:
            # RAW 8-bit ADC planes decode here in VMEM (1 B/sample HBM
            # read instead of 4).  Mosaic has no unsigned->float lowering;
            # widen to i32 first (same as the sublane kernel).
            flat = flat.astype(jnp.int32).astype(jnp.float32) - 127.0
        out = []
        for r in residues:
            if r == 0:
                out.append(flat)
            else:
                padded = jnp.concatenate(
                    [flat, jnp.zeros((1, n2), flat.dtype)], axis=0)
                out.append(_shift_lanes(padded, r, n2))
        return jnp.concatenate(out, axis=0)            # (nv*tr, 128)

    ar = views(re_ref)
    ai = views(im_ref)

    dtr, dti = dtr_ref[...], dti_ref[...]  # win+scale folded blockdiag D^T
    dr = dot(ar, dtr) - dot(ai, dti)       # (nv*tr, 128)
    di = dot(ai, dtr) + dot(ar, dti)
    mag = jnp.sqrt(dr * dr + di * di)

    wtbl = w_ref[...]                      # (nv*tr, 128) weights/mask
    if mode in (CUMU_AVG, CUMU_RAW):
        wm = (mag * wtbl).reshape(nv, t_tile, rows, n2)
        sums = jnp.sum(wm, axis=(0, 2))                # (t_tile, 128)
        out_ref[...] = dot(sums, p_ref[...])           # slot-fold (128, n)
    else:
        k = n2 // n
        from jax.experimental.pallas import tpu as pltpu
        if mode == CUMU_MAX:
            masked = (mag * wtbl).reshape(nv, t_tile, rows, n2)
            red = jnp.max(masked, axis=(0, 2))         # (t_tile, 128)
            for j in range(1, k):
                red = jnp.maximum(red,
                                  pltpu.roll(red, shift=n2 - j * n, axis=1))
            out_ref[...] = red[:, :n]
        else:
            big = jnp.float32(3.4e38)
            masked = jnp.where(wtbl > 0, mag, big).reshape(
                nv, t_tile, rows, n2)
            red = jnp.min(masked, axis=(0, 2))
            for j in range(1, k):
                red = jnp.minimum(red,
                                  pltpu.roll(red, shift=n2 - j * n, axis=1))
            out_ref[...] = red[:, :n]


@functools.lru_cache(maxsize=32)
def _build_packed(cfg: SpecConfig, interpret: bool, t_tile: int,
                  u8: bool = False):
    n = cfg.fft_size
    n2 = _SUBLANE_N2
    rows = cfg.full_size // n2
    w_cnt = cfg.num_windows
    residues, slots = _packed_geometry(cfg)
    nv = len(residues)
    rr = nv * rows
    adj_scale = win_adj(cfg.window, n) * 2.0 / n
    win = window_lut(cfg.window, n)
    k = np.arange(n)
    dft = np.exp(-2j * np.pi * np.outer(k, k) / n)
    # blockdiag of (win*adj_scale-scaled) D^T, one (n, n) block per slot
    dtr = np.zeros((n2, n2), np.float32)
    dti = np.zeros((n2, n2), np.float32)
    # D^T with the window folded on the INPUT index j:
    # Dt[j, k] = D[k, j] * win[j] * adj = dft[j, k] * win[j] * adj
    # (dft = exp(-2pi i jk/n) is symmetric, so no explicit transpose).
    dt_r = (dft.real * win[:, None] * adj_scale).astype(np.float32)
    dt_i = (dft.imag * win[:, None] * adj_scale).astype(np.float32)
    for c in range(n2 // n):
        dtr[c * n:(c + 1) * n, c * n:(c + 1) * n] = dt_r
        dti[c * n:(c + 1) * n, c * n:(c + 1) * n] = dt_i
    # per-slot weight / mask table, pre-tiled over t_tile blocks:
    # A row layout is (view, block, row)
    wts = cumu_weights(cfg.cur_scan_cumu_mode, w_cnt)
    wtbl1 = np.zeros((nv, rows, n2), np.float32)
    for vi, q, c, w in slots:
        wtbl1[vi, q, c * n:(c + 1) * n] = 1.0 if wts is None else wts[w]
    wtbl = np.broadcast_to(wtbl1[:, None, :, :],
                           (nv, t_tile, rows, n2)).reshape(-1, n2).copy()
    # slot-fold projector: out[k] = sum_l v[l] * (l % n == k)
    proj = np.zeros((n2, n), np.float32)
    for l in range(n2):
        proj[l, l % n] = 1.0

    kernel = functools.partial(_kernel_packed, cfg=cfg, t_tile=t_tile,
                               residues=tuple(residues), rows=rows, u8=u8)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    def call(iq_re, iq_im):
        t = iq_re.shape[0]
        assert t % t_tile == 0, (t, t_tile)
        # 2-D blocks: a (t_tile, rows=4, 128) block would pad its
        # 4-sublane middle dim to 8 (2x DMA inflation); the flat
        # (t_tile*rows, 128) view tiles natively.
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
            grid=(t // t_tile,),
            in_specs=[
                pl.BlockSpec((t_tile * rows, n2), lambda i: (i, 0)),
                pl.BlockSpec((t_tile * rows, n2), lambda i: (i, 0)),
                whole((n2, n2)), whole((n2, n2)),
                whole((nv * t_tile * rows, n2)), whole((n2, n)),
            ],
            out_specs=pl.BlockSpec((t_tile, n), lambda i: (i, 0)),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=t * 8 * rr * n2 * n2 // max(1, 1),
                bytes_accessed=t * (cfg.full_size * 8 + n * 4),
                transcendentals=t * rr * n2,
            ),
        )(iq_re.reshape(t * rows, n2), iq_im.reshape(t * rows, n2),
          jnp.asarray(dtr), jnp.asarray(dti), jnp.asarray(wtbl),
          jnp.asarray(proj))
        return jnp.fft.fftshift(acc, axes=-1)

    return jax.jit(call)


def _auto_t_tile_packed(cfg: SpecConfig) -> int:
    per_block = _packed_block_bytes(cfg)
    # Mosaic requires the out block's second-minor dim (t_tile) to be
    # divisible by 8 (interpret mode accepts anything — only hardware
    # rejects e.g. t_tile=2 for an odd T like quickFullScan's 1225-band
    # sweep); the caller zero-pads T up to a t_tile multiple.  The floor
    # candidate (8) is guaranteed to fit: supports_fused_packed rejects
    # configs whose 8-block footprint exceeds the budget.
    for cand in (128, 64, 32, 16, 8):
        if cand * per_block <= _T_TILE_VMEM_BUDGET // 2:
            return cand
    return 8


def curscan_fused_packed(iq_re: jax.Array, iq_im: jax.Array,
                         cfg: SpecConfig, t_tile: int = 0) -> jax.Array:
    """Packed small-FFT curscan: (T, full_size) -> (T, fft_size) fftshifted
    linear spectra, reading each input sample once.  Requires
    ``supports_fused_packed(cfg)``.

    T is zero-padded up to a ``t_tile`` multiple (padded blocks' windows
    carry weight/mask like any other; their rows are sliced off) so any
    batch size lowers on hardware — Mosaic needs the out-block sublane
    dim divisible by 8.

    uint8 inputs are RAW capture planes (value-127 offset,
    octave/load_rtlsdr.m) decoded IN VMEM, same as the sublane kernel —
    the quickFullScan/fm_scan production ingest ships 2 B/sample all the
    way into the kernel."""
    if not supports_fused_packed(cfg):
        raise ValueError("config not supported by packed small kernel")
    u8 = iq_re.dtype == jnp.uint8
    t = iq_re.shape[0]
    if t_tile <= 0:
        t_tile = _auto_t_tile_packed(cfg)
    pad = (-t) % t_tile
    if pad:
        # u8 pads with 127 (decodes to 0.0 in-kernel, matching the f32
        # zero pad); padded rows are sliced off below either way.
        fill = 127 if u8 else 0
        zr = jnp.full((pad, iq_re.shape[1]), fill, iq_re.dtype)
        iq_re = jnp.concatenate([iq_re, zr], axis=0)
        iq_im = jnp.concatenate([iq_im, zr], axis=0)
    interpret = jax.default_backend() != "tpu"
    out = _build_packed(cfg, interpret, t_tile, u8)(iq_re, iq_im)
    return out[:t] if pad else out
