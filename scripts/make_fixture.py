"""Generate raw-IQ capture fixtures in the rtl_sdr uint8 format — the
equivalent of the reference's octave/hkvc-dump_samples.sh (which captures
1024000 samples at 2 freqs x 4 gains via `rtl_sdr`).

Synthesizes deterministic multi-tone IQ (testfft.py grid semantics) and
quantizes to the uint8 interleaved value+127 format of
octave/load_rtlsdr.m, so the whole ingest chain (decode -> curscan ->
waterfall) is exercisable without hardware.

Usage: python scripts/make_fixture.py out.iq [numSamples] [centerFreq] [gain]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from kspecanal_tpu.io.sources import SynthIQSource  # noqa: E402


def make_capture(path: str, n: int = 1_024_000, center_freq: float = 92e6,
                 sample_rate: float = 2.4e6, gain: float = 8.7,
                 seed: int = 0) -> None:
    src = SynthIQSource(center_freq=center_freq, sample_rate=sample_rate,
                        gain=gain, seed=seed)
    re, im = src.read(n)
    # normalize into the uint8 dynamic range around 127
    peak = max(float(np.max(np.abs(re))), float(np.max(np.abs(im))), 1e-9)
    scale = 100.0 / peak
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(np.round(re * scale + 127), 0, 255).astype(np.uint8)
    raw[1::2] = np.clip(np.round(im * scale + 127), 0, 255).astype(np.uint8)
    raw.tofile(path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fixture.iq"
    n = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_024_000
    fc = float(sys.argv[3]) if len(sys.argv) > 3 else 92e6
    g = float(sys.argv[4]) if len(sys.argv) > 4 else 8.7
    make_capture(out, n, fc, gain=g)
    print(f"wrote {out}: {n} samples @ fC={fc} gain={g}")
