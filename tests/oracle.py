"""Independent float64 NumPy oracle of the reference numerics.

This is the test-side ground truth: a direct transcription of the *math*
specified by SURVEY.md §3.3 (the ``sdr_curscan`` formula), §2.1
(``data_cumu`` / ``data_proc`` semantics) and §3.4 (scan stitch index math),
kept deliberately naive/serial so the TPU implementation can be checked
against it within SNR bounds (BASELINE.md correctness target).

Reference derivations (file:line cited per function) — this is NOT the
production code path; the framework never imports from tests/.
"""
from __future__ import annotations

import numpy as np


def oracle_curscan(iq: np.ndarray, fft_size: int, non_overlap: float,
                   window: np.ndarray, cumu_mode: str = "AVG") -> np.ndarray:
    """Serial overlapped windowed-FFT chain (kspecanal.py:368-397):
    numLoops = int(len/ (fftSize*nonOverlap)); per window i starting at
    int(i*fftSize*nonOverlap): winAdj*2*|fft(x*win)|/fftSize; sequential
    cumulate; final fftshift."""
    full = len(iq)
    num_loops = int(full / (fft_size * non_overlap))
    win_adj = len(window) / np.sum(window)
    acc = None
    for i in range(num_loops):
        s = int(i * fft_size * non_overlap)
        e = s + fft_size
        frame = iq[s:e]
        if len(frame) < fft_size:
            break
        mag = win_adj * 2 * np.abs(np.fft.fft(frame * window)) / fft_size
        if acc is None:
            acc = mag
        elif cumu_mode == "AVG":
            acc = (acc + mag) / 2
        elif cumu_mode == "MAX":
            acc = np.maximum(acc, mag)
        elif cumu_mode == "MIN":
            acc = np.minimum(acc, mag)
        elif cumu_mode == "RAW":
            acc = mag
        else:
            raise ValueError(cumu_mode)
    return np.fft.fftshift(acc)


def oracle_log_no_gain(vals: np.ndarray, gain: float,
                       inf_to=None) -> np.ndarray:
    """kspecanal.py:106-112."""
    out = 10 * np.log10(vals) - gain
    if inf_to is not None:
        out[np.isinf(out)] = inf_to
    return out


def oracle_hist_low_clip(vals: np.ndarray) -> np.ndarray:
    """kspecanal.py:97-99: clip below 2nd np.histogram (10-bin) edge."""
    out = np.array(vals)
    hist = np.histogram(out)
    out[out < hist[1][1]] = hist[1][1]
    return out


def oracle_conv_smooth(vals: np.ndarray) -> np.ndarray:
    """kspecanal.py:113-120."""
    kern = np.kaiser(128, 64)
    out = np.convolve(vals, kern, mode="same")
    avg = np.average(out)
    out[:12] = avg
    out[-12:] = avg
    return out


def oracle_compress_1d(data: np.ndarray, mode: str, x_res: int) -> np.ndarray:
    """kspecanal.py:168-200 (with MIN implemented, not the dead branch)."""
    if mode == "RAW":
        return data
    if mode == "CONV":
        return oracle_conv_smooth(data)
    cols = len(data) // x_res
    if cols == 0:
        return data
    t = data[: x_res * cols].reshape(x_res, cols)
    if mode == "MAX":
        return np.max(t, axis=1)
    if mode == "MIN":
        return np.min(t, axis=1)
    if mode == "AVG":
        return np.average(t, axis=1)
    raise ValueError(mode)


def oracle_seq_cumulate(specs: np.ndarray, mode: str) -> np.ndarray:
    """Sequentially cumulate a (N, F) stack per kspecanal.py:124-147 with
    first-entry copy semantics."""
    acc = specs[0].copy()
    for x in specs[1:]:
        if mode == "AVG":
            acc = (acc + x) / 2
        elif mode == "MAX":
            acc = np.maximum(acc, x)
        elif mode == "MIN":
            acc = np.minimum(acc, x)
        elif mode == "RAW":
            acc = x.copy()
    return acc


def synth_tones(freqs_hz, sample_rate: float, n: int, gain_db: float = 0.0,
                t_start: float = 0.0) -> np.ndarray:
    """Deterministic multi-tone complex IQ, testfft.py:58-77 semantics:
    each tone contributes ``g*sin(2πft) + j*g*cos(2πft)`` with
    ``g = 10**(gain/10)``; times from np.linspace(tStart, tStart+dur, n)."""
    gain_mult = 10 ** (gain_db / 10)
    dur = n / sample_rate
    t = np.linspace(t_start, t_start + dur, n)
    s = np.zeros(n, dtype=complex)
    for f in freqs_hz:
        s += gain_mult * (np.sin(2 * np.pi * f * t) + 1j * np.cos(2 * np.pi * f * t))
    return s
