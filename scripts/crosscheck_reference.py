"""Bidirectional replay-compatibility check against the ACTUAL reference
program (requires /root/reference mounted).

The save/play pickle-stream format (kspecanal.py:509-564) is the
correctness oracle for this framework (SURVEY.md §3.5); this script proves
byte-level interop both ways by RUNNING the reference:

  1. reference zeroSpanSave (on its own testfft simulator)  -> our player
     replays it; the simulator's integer-MHz tones must land on MHz bins.
  2. our zeroSpanSave (synth source)                        -> the
     reference's zeroSpanPlay consumes every frame to EOF.

The reference is copied to a temp dir with three RUNTIME shims (never
into this repo): its testfft simulator predates attributes its own
sdr_info prints (valid_gains_db/bandwidth/freq_correction,
kspecanal.py:282-284) and passes a float count to np.linspace, which
modern NumPy rejects.  Verified passing 2026-08-18; the golden file from
step 1 is committed at tests/fixtures/reference_zerospan_1024.save.

Usage: python scripts/crosscheck_reference.py
"""
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

REF = "/root/reference/python"


def main() -> int:
    if not os.path.exists(os.path.join(REF, "kspecanal.py")):
        print("reference tree not available; skipping")
        return 0
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    tmp = tempfile.mkdtemp(prefix="refrun_")
    # stage the reference with the import swapped to its simulator
    src = open(os.path.join(REF, "kspecanal.py")).read()
    src = src.replace("\nimport rtlsdr\n#import testfft as rtlsdr\n",
                      "\n#import rtlsdr\nimport testfft as rtlsdr\n")
    open(os.path.join(tmp, "kspecanal.py"), "w").write(src)
    shutil.copy(os.path.join(REF, "testfft.py"), tmp)
    with open(os.path.join(tmp, "testfft.py"), "a") as f:
        f.write("\n# runtime shims (see module docstring)\n"
                "RtlSdr.valid_gains_db = [0.0, 19.1, 49.6]\n"
                "RtlSdr.bandwidth = 0\n"
                "RtlSdr.freq_correction = 0\n")
    subprocess.run(
        ["sed", "-i",
         "s/np.linspace(tStart, tStart+dur, self.sample_rate\\*dur)/"
         "np.linspace(tStart, tStart+dur, int(self.sample_rate*dur))/",
         os.path.join(tmp, "testfft.py")], check=True)
    env = dict(os.environ, MPLBACKEND="Agg")

    # --- 1) reference records -> we replay
    ref_save = os.path.join(tmp, "ref.save")
    subprocess.run(
        [sys.executable, "kspecanal.py", "zeroSpanSave", "zeroSpanSaveFile",
         ref_save, "prgLoopCnt", "6", "fftSize", "1024",
         "centerFreq", "92e6"],
        cwd=tmp, env=env, stdin=subprocess.DEVNULL, capture_output=True,
        timeout=240)  # exits nonzero on its final input() — expected
    from kspecanal_tpu.io.replay import ZeroSpanPlayer
    p = ZeroSpanPlayer(ref_save)
    assert (p.header.center_freq, p.header.sampling_rate,
            p.header.gain) == (92e6, 2.4e6, 19.1)
    frames = list(p.frames())
    p.close()
    assert len(frames) == 6 and len(frames[0][1]) == 1024
    freqs = np.fft.fftshift(np.fft.fftfreq(1024, 1 / 2.4e6)) + 92e6
    spec = np.asarray(frames[-1][1])
    for f in freqs[np.argsort(spec)[-3:]]:
        assert abs(f - round(f / 1e6) * 1e6) < 2.4e6 / 1024, f
    print("reference-save -> our-replay: OK (tones on MHz bins)")

    # --- 2) we record -> reference replays
    ours = os.path.join(tmp, "ours.save")
    from kspecanal_tpu.cli import main as kmain
    kmain(["zeroSpanSave", "centerFreq", "92e6", "fftSize", "1024",
           "samplingRate", "2.4e6", "tpuSource", "synth",
           "zeroSpanSaveFile", ours, "prgLoopCnt", "5"])
    out = subprocess.run(
        [sys.executable, "kspecanal.py", "zeroSpanPlay",
         "zeroSpanPlayFile", ours],
        cwd=tmp, env=env, stdin=subprocess.DEVNULL, capture_output=True,
        text=True, timeout=240)
    played = [ln for ln in out.stdout.splitlines()
              if ln.startswith("ZeroSpan:")]
    assert len(played) >= 5, out.stdout[-2000:]
    print(f"our-save -> reference-replay: OK ({len(played)} iterations)")
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
