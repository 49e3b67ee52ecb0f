"""Bit-level math parity against the REFERENCE'S OWN CODE.

Executes the reference module's function definitions in-process (source
truncated before its module-level main, which runs unconditionally at
kspecanal.py:1139) and compares its ``sdr_curscan`` — the DSP hot loop —
against our ``curscan`` on identical IQ, for every window family, overlap,
and cumulate mode.  Skipped when the reference tree is not mounted.

This is runtime USE of the reference for validation; no reference code is
incorporated into the framework.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from kspecanal_tpu.config import (SpecConfig, WINDOW_HAMMING, WINDOW_HANNING,
                                  WINDOW_KAISER, WINDOW_ONES)
from kspecanal_tpu.ops.spectrum import curscan

_REF = "/root/reference/python/kspecanal.py"

pytestmark = pytest.mark.skipif(not os.path.exists(_REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_ns():
    import sys
    import types
    src = open(_REF).read()
    cut = src.index("\ngD = {}\n")
    # the reference imports rtlsdr unconditionally (kspecanal.py:13); none
    # of the functions under test touch it, so stub the module
    if "rtlsdr" not in sys.modules:
        sys.modules["rtlsdr"] = types.ModuleType("rtlsdr")
    import matplotlib
    matplotlib.use("Agg", force=True)
    ns = {}
    exec(compile(src[:cut], _REF, "exec"), ns)  # defs only, no main
    return ns


class _FixedSdr:
    """Duck SDR returning slices of a fixed complex capture."""

    def __init__(self, z):
        self._z = z
        self._pos = 0

    def read_samples(self, n):
        n = int(n)
        out = self._z[self._pos:self._pos + n]
        if len(out) < n:  # wrap (plenty of data in tests)
            out = np.concatenate([out, self._z[: n - len(out)]])
        self._pos += n
        return out


_WINDOWS = {  # our name -> reference window key construction
    WINDOW_ONES: ("WIN.ONES", lambda ns, n: np.ones(n)),
    WINDOW_HAMMING: ("WIN.HAMMING", lambda ns, n: np.hamming(n)),
    WINDOW_HANNING: ("WIN.HANNING", lambda ns, n: np.hanning(n)),
    WINDOW_KAISER: ("WIN.KAISER", lambda ns, n: np.kaiser(n, 64)),
}


@pytest.mark.parametrize("window,nono,mode", [
    (WINDOW_ONES, 0.5, "AVG"),
    (WINDOW_HANNING, 0.1, "AVG"),     # reference defaults
    (WINDOW_KAISER, 0.5, "MAX"),
    (WINDOW_HAMMING, 0.25, "MIN"),
    (WINDOW_KAISER, 0.1, "RAW"),
])
def test_sdr_curscan_parity(ref_ns, window, nono, mode):
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=1024, sampling_rate=2.4e6,
                     window=window, cur_scan_non_overlap=nono,
                     cur_scan_cumu_mode=mode).finalize()
    rng = np.random.default_rng(42)
    z = (rng.standard_normal(2 * cfg.full_size)
         + 1j * rng.standard_normal(2 * cfg.full_size))

    d = {
        "sdr": _FixedSdr(z),
        "fullSize": cfg.full_size,
        "fftSize": cfg.fft_size,
        "curScanNonOverlap": nono,
        "curScanCumuMode": mode,
        "theWin": _WINDOWS[window][1](ref_ns, cfg.fft_size),
        "bUsePSD": False,
    }
    want = ref_ns["sdr_curscan"](d)  # float64 reference math

    re = jnp.asarray(z[: cfg.full_size].real, jnp.float32)
    im = jnp.asarray(z[: cfg.full_size].imag, jnp.float32)
    got = np.asarray(curscan(re, im, cfg))

    assert want.shape == got.shape == (cfg.fft_size,)
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-12))
    assert err < 5e-5, err


# NOTE on the bUsePSD branch (kspecanal.py:374-384): it cannot run
# unmodified on modern matplotlib — the reference passes a FLOAT noverlap
# (fftSize*(1-curScanNonOverlap)) which mlab now rejects with a TypeError
# in sliding_window_view.  Our psd_welch is instead validated directly
# against matplotlib.mlab.psd with the reference's parameters in
# tests/test_spectrum.py (mlab PSD parity).
