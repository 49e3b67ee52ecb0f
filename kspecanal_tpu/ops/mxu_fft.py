"""Matmul-based FFT on the MXU (two-factor Cooley-Tukey / Bailey 4-step).

XLA's built-in TPU FFT runs at ~0.2 TFLOP/s effective on this chip while
the MXU does ~95 TFLOP/s (measured, scripts/perf_probe.py) — so we trade
FLOPs for MXU-friendliness: decompose N = N1*N2 and express the DFT as two
batched matmuls against precomputed DFT matrices plus a twiddle multiply:

    n = n1*N2 + n2,  k = k1 + N1*k2
    A[n1, n2] = x[n1*N2 + n2]
    B[k1, n2] = sum_n1 F1[k1, n1] * A[n1, n2]          (matmul over N1)
    C[k1, n2] = B[k1, n2] * T[k1, n2],  T = W_N^(k1*n2) (twiddle)
    X[k1 + N1*k2] = sum_n2 C[k1, n2] * F2[k2, n2]      (matmul over N2)

Cost: 8*N*(N1+N2) real FLOPs per transform vs 5*N*log2(N) for a radix-2
FFT — ~14x more FLOPs at N=2048, but they run on a unit ~500x faster than
wherever XLA's FFT lands, measured end-to-end ~10-40x faster here.

Complex arithmetic is carried as split float32 planes (TPUs have no complex
ALU; this also keeps the host boundary complex-free).  Matmuls run with
``preferred_element_type=float32`` and HIGHEST precision (bf16x3 passes on
the MXU) to hold ~1e-6 relative error vs the float64 oracle — validated in
tests/test_mxu_fft.py.

Factor choice: N1, N2 as close to sqrt(N) as possible, biased toward
multiples of 128 (MXU tile) for large N; N=16384 -> 128x128 is a perfect
fit.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST

_PRECISIONS = {
    "DEFAULT": jax.lax.Precision.DEFAULT,
    "HIGH": jax.lax.Precision.HIGH,
    "HIGHEST": jax.lax.Precision.HIGHEST,
}


def matmul_precision(name: str) -> jax.lax.Precision:
    """Map a SpecConfig.tpu_precision string to a lax.Precision."""
    try:
        return _PRECISIONS[name.upper()]
    except KeyError:
        raise ValueError(f"unknown tpuPrecision {name!r} "
                         f"(one of {sorted(_PRECISIONS)})") from None


# Per-size factor overrides (n -> (n1, n2)), tuned on hardware; see
# scripts/perf_probe.py.  The stage-1 matmul contracts n1, so MXU-sized n1
# (128) can beat the balanced split even though total FLOPs rise.
# Measured (fused kernel, Gsamp/s): 2048: (64,32)=1.80 (128,16)=2.02;
# 4096: (64,64)=2.93 best; 16384: (128,128)=5.0 best.
FACTOR_OVERRIDES: dict = {2048: (128, 16)}


@functools.lru_cache(maxsize=64)
def _factorize(n: int) -> Tuple[int, int]:
    """Split n = n1*n2 with n1 >= n2, both as close to sqrt(n) as we can
    (unless overridden in FACTOR_OVERRIDES)."""
    if n in FACTOR_OVERRIDES:
        n1, n2 = FACTOR_OVERRIDES[n]
        assert n1 * n2 == n
        return (n1, n2)
    best = (n, 1)
    r = int(np.sqrt(n))
    for n2 in range(r, 0, -1):
        if n % n2 == 0:
            best = (n // n2, n2)
            break
    return best


@functools.lru_cache(maxsize=64)
def _dft_tables_for(n: int, n1: int, n2: int):
    """Precompute (F1re, F1im, F2re, F2im, Tre, Tim) float32 tables for an
    explicit n = n1*n2 split."""
    assert n1 * n2 == n, (n, n1, n2)
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)          # (n1, n1)
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)          # (n2, n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)           # (n1, n2)
    return tuple(np.asarray(a, np.float32) for a in (
        f1.real, f1.imag, f2.real, f2.imag, tw.real, tw.imag))


def _dft_tables(n: int):
    """Tables for the default `_factorize` split of n."""
    n1, n2 = _factorize(n)
    return _dft_tables_for(n, n1, n2)


def fft_mxu(re: jax.Array, im: jax.Array,
            precision: jax.lax.Precision = _HIGHEST,
            ) -> Tuple[jax.Array, jax.Array]:
    """Batched complex DFT of split planes: (..., N) -> (..., N).

    Equivalent to ``jnp.fft.fft(re + 1j*im, axis=-1)`` split into planes,
    but lowered to MXU matmuls.  N must be factorizable (any non-prime).
    """
    n = re.shape[-1]
    n1, n2 = _factorize(n)
    if n2 == 1:  # prime length: fall back to XLA's FFT
        spec = jnp.fft.fft(re + 1j * im, axis=-1)
        return jnp.real(spec), jnp.imag(spec)
    f1r, f1i, f2r, f2i, twr, twi = (jnp.asarray(t) for t in _dft_tables(n))
    batch = re.shape[:-1]
    ar = re.reshape(batch + (n1, n2))
    ai = im.reshape(batch + (n1, n2))

    # B = F1 @ A  (contract n1; batch dims ride along)
    def mm_f1(x):
        return jnp.einsum("kn,...nm->...km", f1r, x, precision=precision), \
               jnp.einsum("kn,...nm->...km", f1i, x, precision=precision)

    # B = (F1r + iF1i)(Ar + iAi) = (F1r@Ar - F1i@Ai) + i(F1r@Ai + F1i@Ar)
    brr, bri = mm_f1(ar)   # F1r@Ar, F1i@Ar
    bir, bii = mm_f1(ai)   # F1r@Ai, F1i@Ai
    br = brr - bii
    bi = bir + bri

    # C = B * T (elementwise twiddle)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # D[k2, k1] = sum_n2 C[k1, n2] F2[k2, n2]
    def mm_f2(x):
        return jnp.einsum("...km,lm->...lk", x, f2r, precision=precision), \
               jnp.einsum("...km,lm->...lk", x, f2i, precision=precision)

    drr, dri = mm_f2(cr)
    dir_, dii = mm_f2(ci)
    dr = drr - dii
    di = dir_ + dri
    # X[k1 + N1*k2] = D[k2, k1]: row-major flatten of (n2, n1)
    return (dr.reshape(batch + (n,)), di.reshape(batch + (n,)))


def fft_mag_mxu(re: jax.Array, im: jax.Array,
                precision: jax.lax.Precision = _HIGHEST) -> jax.Array:
    """|FFT| via the MXU path."""
    xr, xi = fft_mxu(re, im, precision=precision)
    return jnp.sqrt(xr * xr + xi * xi)
