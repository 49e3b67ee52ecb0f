"""The DSP hot path: overlapped sliding-window FFT magnitude spectra.

This replaces the reference's serial per-window Python loop
(``sdr_curscan``, kspecanal.py:351-397) with one batched, jit-compiled
chain:

    frame -> window-multiply -> FFT -> |.| normalize -> window-reduce -> fftshift

Per-window math being reproduced exactly (kspecanal.py:373,391,396):

    winAdj = len(win) / sum(win)
    fftN   = winAdj * 2 * |fft(frame * win)| / fftSize
    spec   = fftshift(cumulate(fftN over windows))

TPU-first design notes:
  * IQ never crosses the host<->device boundary as complex — this backend
    cannot transfer complex dtypes.  IQ is carried as two float32 planes
    (re, im); the complex value exists only inside the jitted computation,
    which XLA decomposes into float pairs anyway (TPUs have no complex ALU).
  * All shapes are static: the valid window starts are precomputed from the
    config (kspecanal.py:368,385-390 semantics, including the per-index
    ``int(i*fftSize*nonOverlap)`` truncation and the early break on a short
    tail window), so XLA sees a fixed ``(num_windows, fft_size)`` batch.
  * The per-window cumulate (serial ``(a+b)/2`` decay / max / min / raw,
    kspecanal.py:392-395) becomes a single weighted reduction over the
    window axis (see ``config.cumu_weights``) — a matvec the MXU eats.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kspecanal_tpu.config import SpecConfig, cumu_weights, win_adj, window_lut
from kspecanal_tpu.ops.dsp import reduce_windows


def frame_signal(x: jax.Array, starts: Tuple[int, ...],
                 frame_len: int) -> jax.Array:
    """Extract overlapped frames ``(len(starts), frame_len)`` from a 1-D
    signal.

    ``starts`` is a static tuple, so when the stride is uniform XLA sees a
    strided gather it can vectorize; non-uniform starts (fractional hop,
    kspecanal.py:386) still lower to one gather with a precomputed index
    matrix rather than a serial loop.
    """
    starts_arr = np.asarray(starts, np.int32)
    # One gather with a static (W, F) index matrix; XLA lowers this well and
    # it is exact for non-uniform starts (fractional hop truncation).
    gather_idx = starts_arr[:, None] + np.arange(frame_len, dtype=np.int32)[None, :]
    return jnp.take(x, jnp.asarray(gather_idx), axis=0)


def windowed_mags(iq_re: jax.Array, iq_im: jax.Array,
                  cfg: SpecConfig) -> jax.Array:
    """Per-window normalized magnitude spectra ``(num_windows, fft_size)``,
    NOT yet window-reduced or fftshifted (kspecanal.py:385-391)."""
    starts = cfg.window_starts
    n = cfg.fft_size
    fre = frame_signal(iq_re, starts, n)
    fim = frame_signal(iq_im, starts, n)
    win = jnp.asarray(window_lut(cfg.window, n), fre.dtype)
    adj = win_adj(cfg.window, n)
    z = (fre * win) + 1j * (fim * win)
    spec = jnp.fft.fft(z, axis=-1)
    return (adj * 2.0 / n) * jnp.abs(spec)


def curscan(iq_re: jax.Array, iq_im: jax.Array, cfg: SpecConfig) -> jax.Array:
    """Full ``sdr_curscan`` equivalent: one linear-magnitude, fftshifted
    spectrum of length ``fft_size`` from ``full_size`` IQ samples
    (kspecanal.py:351-397)."""
    mags = windowed_mags(iq_re, iq_im, cfg)
    w = cumu_weights(cfg.cur_scan_cumu_mode, cfg.num_windows)
    spec = reduce_windows(cfg.cur_scan_cumu_mode, mags, w)
    return jnp.fft.fftshift(spec)


@functools.partial(jax.jit, static_argnames=("cfg",))
def curscan_jit(iq_re: jax.Array, iq_im: jax.Array,
                cfg: SpecConfig) -> jax.Array:
    return curscan(iq_re, iq_im, cfg)


def curscan_batched(iq_re: jax.Array, iq_im: jax.Array,
                    cfg: SpecConfig) -> jax.Array:
    """vmapped curscan over a leading batch axis: ``(B, full_size)`` IQ ->
    ``(B, fft_size)`` spectra.  Used by scan mode (every retune band's
    curscan is independent) and by the streaming/throughput paths."""
    return jax.vmap(lambda r, i: curscan(r, i, cfg))(iq_re, iq_im)


def fft_freqs(cfg: SpecConfig, center_freq: Optional[float] = None) -> np.ndarray:
    """fftshifted bin center frequencies (kspecanal.py:444-445)."""
    fc = cfg.center_freq if center_freq is None else center_freq
    return np.fft.fftshift(
        np.fft.fftfreq(cfg.fft_size, 1.0 / cfg.sampling_rate) + fc)


def psd_welch(iq_re: jax.Array, iq_im: jax.Array, cfg: SpecConfig) -> jax.Array:
    """Cross-validation path: Welch-style power spectral density matching
    ``matplotlib.mlab.psd`` semantics (the reference's ``bUsePSD`` check,
    kspecanal.py:374-384, added "to verify that the program's internal
    logic is working as expected" per README.rst:523-529).

    mlab.psd with ``NFFT=fft_size``, ``noverlap=fft_size*(1-nonOverlap)``,
    ``Fs=2`` (its default), a user window, and complex input:
      segments stride by ``NFFT - noverlap``; each is windowed, FFT'd,
      |.|^2, averaged over segments, scaled by ``1/(Fs*sum(win^2))``, all
      bins except DC and Nyquist doubled... for complex (onesided=False) no
      doubling, full spectrum.  Returns the two-sided PSD, NOT fftshifted
      (mlab returns freqs via fftshift ordering for complex; we return
      fftshifted to align with curscan's output ordering).
    """
    n = cfg.fft_size
    noverlap = int(n * (1 - cfg.cur_scan_non_overlap))
    step = n - noverlap
    total = iq_re.shape[0]
    num = (total - noverlap) // step
    starts = tuple(i * step for i in range(num) if i * step + n <= total)
    fre = frame_signal(iq_re, starts, n)
    fim = frame_signal(iq_im, starts, n)
    win = jnp.asarray(window_lut(cfg.window, n), fre.dtype)
    # mlab.psd's default detrend is 'none', so frames are windowed as-is.
    z = fre * win + 1j * (fim * win)
    spec = jnp.fft.fft(z, axis=-1)
    pxx = jnp.mean(jnp.abs(spec) ** 2, axis=0)
    fs = 2.0  # mlab default when Fs is unspecified (kspecanal.py:381)
    pxx = pxx / (fs * jnp.sum(win * win))
    return jnp.fft.fftshift(pxx)


def curscan_direct_batched(iq_re: jax.Array, iq_im: jax.Array,
                           cfg: SpecConfig) -> jax.Array:
    """Small-FFT curscan via a DIRECT DFT matmul.

    For small fft_size (quickFullScan runs 64, kspecanal.py:920) the
    problem is thousands of tiny FFTs — latency-bound on any FFT algorithm
    but a single wide ``(B*W, N) @ (N, N)`` matmul on the MXU.  The N^2
    FLOPs are irrelevant at these sizes; the matmul is one op.
    Numerics identical to curscan (same framing/normalize/cumulate).
    """
    n = cfg.fft_size
    starts = cfg.window_starts
    k = np.arange(n)
    dft = np.exp(-2j * np.pi * np.outer(k, k) / n)
    fr = jnp.asarray(dft.real, jnp.float32)
    fi = jnp.asarray(dft.imag, jnp.float32)
    win = jnp.asarray(window_lut(cfg.window, n), jnp.float32)
    adj = win_adj(cfg.window, n)

    def one(re_row, im_row):
        from kspecanal_tpu.ops.mxu_fft import matmul_precision
        ar = frame_signal(re_row, starts, n) * win     # (W, n)
        ai = frame_signal(im_row, starts, n) * win
        hi = matmul_precision(cfg.tpu_precision)
        xr = (jnp.dot(ar, fr.T, precision=hi)
              - jnp.dot(ai, fi.T, precision=hi))
        xi = (jnp.dot(ai, fr.T, precision=hi)
              + jnp.dot(ar, fi.T, precision=hi))
        mags = (adj * 2.0 / n) * jnp.sqrt(xr * xr + xi * xi)
        w = cumu_weights(cfg.cur_scan_cumu_mode, cfg.num_windows)
        from kspecanal_tpu.ops.dsp import reduce_windows
        return jnp.fft.fftshift(
            reduce_windows(cfg.cur_scan_cumu_mode, mags, w))

    return jax.vmap(one)(iq_re, iq_im)


def _fused_choice(cfg: SpecConfig, u8: bool = False) -> Optional[str]:
    """Pick the fused-kernel layout for this (fft_size, precision) cell
    from the hardware-measured table (scripts/perf_followup.py, v5e,
    after the chunked block-diag optimization; round-5's 3M matmuls and
    marginal-rate methodology lift the DEFAULT cells well above these
    dispatch-diluted readings — docs/DESIGN.md — but do not change the
    ORDERING except the u8@16384 case below):

      Gsamp/s         HIGHEST   HIGH   DEFAULT
      256   sublane     3.06            4.92     (direct DFT: 2.33)
      512   sublane     3.33
      1024  sublane     4.07     5.40   6.55
      2048  sublane     4.00     5.59   8.27     (lane: 2.29/2.62/3.04)
      4096  sublane     4.47     3.90   8.17     (lane auto-t_tile:
                                                  3.19/3.78/6.02; a forced
                                                  lane t_tile=4 HIGH hit
                                                  4.35 but exceeds the
                                                  auto VMEM budget)
      8192  sublane     4.31            7.00     (lane: 3.09/-/5.55)
      16384 lane        4.69     (6.16 sublane)  8.52 (sublane 8.28)

    Sublane wins almost everywhere now that its stage-1 block-diag is
    chunked to MXU tiles; the lane layout's 128-wide DFT factors keep a
    slight edge only at 16384 HIGHEST/DEFAULT for f32 inputs (r5
    marginal, DEFAULT: lane 23.4 vs sublane 21.9 Gsamp/s).  RAW u8
    inputs at 16384 DEFAULT take the sublane kernel instead — the lane
    kernel has no in-VMEM decode, so u8 would pay an XLA decode pass +
    the full f32 HBM read (r5 marginal: sublane u8 39.9 vs that ~23.4
    ceiling).
    """
    from kspecanal_tpu.ops import pallas_curscan as pk
    fft = cfg.fft_size
    prec = cfg.tpu_precision.upper()
    sub_ok = pk.supports_fused_sublane(cfg)
    lane_ok = pk.supports_fused(cfg) and fft >= 2048
    if not (sub_ok or lane_ok):
        return None
    if sub_ok and lane_ok:
        if fft >= 16384:
            if prec == "DEFAULT" and u8:
                return "sublane"
            return "sublane" if prec == "HIGH" else "lane"
        return "sublane"
    return "sublane" if sub_ok else "lane"


def curscan_auto_batched(iq_re: jax.Array, iq_im: jax.Array,
                         cfg: SpecConfig) -> jax.Array:
    """Best batched curscan for the current backend:
      * a fused Pallas kernel on TPU when fft_size is a multiple of 128
        (layout per the measured table in ``_fused_choice``; the sublane
        layout handles ANY window starts via in-VMEM lane rotation, so the
        reference-default 90% fractional hop takes this path too);
      * the packed read-input-once kernel for tiny fft_size (64/128 —
        the quickFullScan regime, kspecanal.py:916-921), measured v5e
        (scripts/perf_r2.py small, T=16384, ovl 0.5, Gsamp/s):
          fft64:  packed 2.75/2.91 (HIGHEST/DEFAULT)  direct 2.22/2.31
          fft128: packed 2.35/2.52                    direct 1.98/2.03
        This regime is DISPATCH-floor-bound at that batch size: per
        dispatch the kernel touches 67 MB of HBM (~0.2 ms at 350 GB/s)
        while the whole call takes ~2.9 ms, and t_tile sweeps move it
        < 8% — the bench measures it at 4x the batch to amortize.
      * direct DFT matmul for other small fft_size (non-pow2 <= 256);
      * the XLA gather+FFT chain otherwise."""
    from kspecanal_tpu.ops import pallas_curscan
    u8 = iq_re.dtype == jnp.uint8
    if jax.default_backend() == "tpu":
        choice = _fused_choice(cfg, u8)
        if choice == "sublane":
            # u8 planes pass straight through: the kernel decodes in VMEM
            # (4x less HBM read — the DEFAULT-precision binding limit).
            return pallas_curscan.curscan_fused_sublane(iq_re, iq_im, cfg)
        if pallas_curscan.supports_fused_packed(cfg):
            # u8-capable too (in-VMEM decode): the quickFullScan/fm_scan
            # production ingest keeps 2 B/sample into the kernel.
            return pallas_curscan.curscan_fused_packed(iq_re, iq_im, cfg)
        if u8:
            iq_re = iq_re.astype(jnp.float32) - 127.0
            iq_im = iq_im.astype(jnp.float32) - 127.0
            u8 = False            # decoded: the fall-through below must not
        if choice == "lane":      # subtract 127 a second time
            return pallas_curscan.curscan_fused(iq_re, iq_im, cfg)
        if cfg.fft_size <= 256:
            # No fused kernel applies (non-pow2 tiny fft, or 256 with a
            # fractional hop whose full_size misaligns): the direct DFT
            # matmul still beats the XLA chain here (2.33 Gsamp/s @256).
            return curscan_direct_batched(iq_re, iq_im, cfg)
    if u8:
        iq_re = iq_re.astype(jnp.float32) - 127.0
        iq_im = iq_im.astype(jnp.float32) - 127.0
    return curscan_batched(iq_re, iq_im, cfg)
