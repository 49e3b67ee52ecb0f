"""Fused Pallas curscan kernel (interpret mode on CPU) and the MXU matmul
DFT vs the XLA chain / NumPy."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kspecanal_tpu.config import (SpecConfig, WINDOW_HANNING, WINDOW_KAISER,
                                  WINDOW_ONES)
from kspecanal_tpu.ops.mxu_fft import _factorize, fft_mxu
from kspecanal_tpu.ops.pallas_curscan import curscan_fused, supports_fused
from kspecanal_tpu.ops.spectrum import curscan_auto_batched, curscan_batched


def test_mxu_fft_matches_numpy(rng):
    for n in (64, 256, 2048, 250):
        x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        xr, xi = jax.jit(fft_mxu)(jnp.asarray(x.real, jnp.float32),
                                  jnp.asarray(x.imag, jnp.float32))
        got = np.asarray(xr) + 1j * np.asarray(xi)
        want = np.fft.fft(x, axis=-1)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_factorize():
    assert _factorize(16384) == (128, 128)
    assert _factorize(2048) == (128, 16)  # hardware-tuned override
    assert _factorize(64) == (8, 8)
    assert _factorize(13) == (13, 1)  # prime -> XLA fallback


@pytest.mark.parametrize("fft_size,window,mode", [
    (2048, WINDOW_KAISER, "AVG"),
    (256, WINDOW_HANNING, "MAX"),
    (64, WINDOW_ONES, "MIN"),
    (4096, WINDOW_KAISER, "RAW"),
])
def test_fused_kernel_matches_chain(rng, fft_size, window, mode):
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft_size,
                     sampling_rate=2.4e6, window=window,
                     cur_scan_non_overlap=0.5,
                     cur_scan_cumu_mode=mode).finalize()
    assert supports_fused(cfg)
    re = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
    got = np.asarray(curscan_fused(re, im, cfg))
    want = np.asarray(jax.jit(
        lambda r, i: curscan_batched(r, i, cfg))(re, im))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_fused_rejects_misaligned():
    cfg = SpecConfig(fft_size=2048, cur_scan_non_overlap=0.1)
    assert not supports_fused(cfg)
    with pytest.raises(ValueError):
        curscan_fused(jnp.zeros((1, cfg.full_size)),
                      jnp.zeros((1, cfg.full_size)), cfg)


def test_auto_dispatch_runs_everywhere(rng):
    """curscan_auto_batched must work for any config on any backend."""
    for nono in (0.5, 0.1):
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=256,
                         sampling_rate=2.4e6, window=WINDOW_HANNING,
                         cur_scan_non_overlap=nono).finalize()
        re = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
        out = jax.jit(lambda r, i: curscan_auto_batched(r, i, cfg))(re, im)
        assert out.shape == (2, cfg.fft_size)


def test_direct_dft_matches_chain(rng):
    from kspecanal_tpu.ops.spectrum import curscan_direct_batched
    for fft, mode in [(64, "AVG"), (256, "MAX"), (128, "RAW")]:
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                         sampling_rate=2.4e6, window=WINDOW_HANNING,
                         cur_scan_non_overlap=0.5,
                         cur_scan_cumu_mode=mode).finalize()
        re = jnp.asarray(rng.standard_normal((3, cfg.full_size)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((3, cfg.full_size)), jnp.float32)
        got = np.asarray(jax.jit(
            lambda r, i: curscan_direct_batched(r, i, cfg))(re, im))
        want = np.asarray(jax.jit(
            lambda r, i: curscan_batched(r, i, cfg))(re, im))
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_fused_precision_variants_match_on_cpu():
    """tpuPrecision changes MXU pass count on hardware; in interpret mode
    all variants use plain f32 dots, but DEFAULT's 3-multiplication
    complex form (round 5: Ci = T3-T1-T2) reassociates the products, so
    it matches HIGHEST only to f32 rounding (~1e-6 relative); HIGH
    applies its hand-rolled bf16x3 operand split (~1e-5 relative)."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_HANNING
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused, supports_fused
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048, sampling_rate=2.4e6,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5).finalize()
    assert supports_fused(cfg)
    rng = np.random.default_rng(3)
    re = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
    base = curscan_fused(re, im, cfg)
    got = curscan_fused(re, im, dataclasses.replace(cfg, tpu_precision="DEFAULT"))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-9)
    got = curscan_fused(re, im, dataclasses.replace(cfg, tpu_precision="HIGH"))
    np.testing.assert_allclose(got, base, rtol=2e-4, atol=1e-8)


def test_fused_t_tile_matches_untiled():
    """Multi-block grid steps (t_tile) must be bit-identical to t_tile=1."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.5).finalize()
    rng = np.random.default_rng(4)
    re = jnp.asarray(rng.standard_normal((4, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((4, cfg.full_size)), jnp.float32)
    base = curscan_fused(re, im, cfg, t_tile=1)
    for tt in (2, 4):
        got = curscan_fused(re, im, cfg, t_tile=tt)
        # same math; only the dot's lane grouping changes, so any delta is
        # accumulation-order float noise
        np.testing.assert_allclose(got, base, rtol=2e-6, atol=1e-9)


def test_sublane_fused_matches_xla_chain():
    """Sublane-layout fused kernel vs the XLA chain across sizes, including
    sizes below the lane-layout threshold (works from fft 256 up)."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import (curscan_fused_sublane,
                                                  supports_fused_sublane)
    from kspecanal_tpu.ops.spectrum import curscan_batched
    rng = np.random.default_rng(11)
    for fft in (256, 2048):
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=0.5).finalize()
        assert supports_fused_sublane(cfg)
        re = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
        ref = curscan_batched(re, im, cfg)
        got = curscan_fused_sublane(re, im, cfg, t_tile=2)
        np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-9)
    # fractional hop (0.1 nonOverlap -> truncated, misaligned starts) IS
    # supported since round 2: frames come from per-residue in-VMEM lane
    # rotations (pallas_curscan._shift_lanes), no HBM gather.
    frac = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048, sampling_rate=2.4e6,
                      window=WINDOW_KAISER, cur_scan_non_overlap=0.1).finalize()
    assert supports_fused_sublane(frac)
    re = jnp.asarray(rng.standard_normal((2, frac.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, frac.full_size)), jnp.float32)
    np.testing.assert_allclose(curscan_fused_sublane(re, im, frac, t_tile=1),
                               curscan_batched(re, im, frac),
                               rtol=5e-5, atol=1e-9)
    # and the in-kernel window-group chunking is exact (wg < num_windows)
    np.testing.assert_allclose(
        curscan_fused_sublane(re, im, frac, t_tile=1, wg=8),
        curscan_batched(re, im, frac), rtol=5e-5, atol=1e-9)


def test_fused_choice_table():
    """Dispatch picks the hardware-measured winner per (fft, precision)."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.spectrum import _fused_choice
    def cfg(fft, prec="HIGHEST", nono=0.5):
        return SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=nono,
                          tpu_precision=prec).finalize()
    assert _fused_choice(cfg(256)) == "sublane"
    assert _fused_choice(cfg(2048)) == "sublane"
    assert _fused_choice(cfg(8192)) == "sublane"
    assert _fused_choice(cfg(4096, "HIGHEST")) == "sublane"
    assert _fused_choice(cfg(4096, "DEFAULT")) == "sublane"
    assert _fused_choice(cfg(16384, "HIGHEST")) == "lane"
    assert _fused_choice(cfg(16384, "HIGH")) == "sublane"
    # f32 keeps the lane layout at 16384 DEFAULT, but raw u8 takes the
    # sublane kernel for its in-VMEM decode (r5: 39.9 vs ~23.4 Gsamp/s)
    assert _fused_choice(cfg(16384, "DEFAULT")) == "lane"
    assert _fused_choice(cfg(16384, "DEFAULT"), u8=True) == "sublane"
    # fractional hop: the rolled sublane framing applies (round 2)
    assert _fused_choice(cfg(2048, nono=0.1)) == "sublane"
    # 64 is not 128-divisible -> no sublane; lane needs >= 2048
    assert _fused_choice(cfg(64)) is None




def test_auto_dispatch_routes_small_to_packed():
    """On a TPU backend the production dispatch must reach the packed
    read-once kernel for the quickFullScan regime (fftSize 64,
    kspecanal.py:916-921) — round 2 built it but never wired it in."""
    from unittest import mock
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops import pallas_curscan, spectrum

    def cfg(fft, nono=0.5):
        return SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                          sampling_rate=2.4e6, window=WINDOW_KAISER,
                          cur_scan_non_overlap=nono, x_res=fft).finalize()

    calls = []
    with mock.patch.object(spectrum.jax, "default_backend",
                           lambda: "tpu"), \
         mock.patch.object(pallas_curscan, "curscan_fused_packed",
                           lambda r, i, c, **kw: calls.append(c.fft_size)), \
         mock.patch.object(pallas_curscan, "curscan_fused_sublane",
                           lambda r, i, c, **kw: calls.append("sublane")):
        re = jnp.zeros((2, cfg(64).full_size), jnp.float32)
        spectrum.curscan_auto_batched(re, re, cfg(64))
        spectrum.curscan_auto_batched(re, re, cfg(64, nono=0.1))
        re2 = jnp.zeros((2, cfg(128).full_size), jnp.float32)
        spectrum.curscan_auto_batched(re2, re2, cfg(128))
    assert calls == [64, 64, 128]


def test_sublane_kernel_u8_input_matches_decoded():
    """uint8 raw-plane input to the sublane kernel (in-VMEM decode,
    4x less HBM read) is bit-identical to decoding on the host first."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused_sublane
    rng = np.random.default_rng(31)
    for nono in (0.5, 0.1):
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=512,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=nono).finalize()
        raw_re = rng.integers(0, 256, (4, cfg.full_size), dtype=np.uint8)
        raw_im = rng.integers(0, 256, (4, cfg.full_size), dtype=np.uint8)
        dec_re = jnp.asarray(raw_re.astype(np.float32) - 127.0)
        dec_im = jnp.asarray(raw_im.astype(np.float32) - 127.0)
        got = curscan_fused_sublane(jnp.asarray(raw_re), jnp.asarray(raw_im),
                                    cfg, t_tile=2)
        want = curscan_fused_sublane(dec_re, dec_im, cfg, t_tile=2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_dispatch_u8_decodes_off_fused_path():
    """u8 planes through curscan_auto_batched on a CPU backend (no fused
    kernel) must equal the host-decoded chain exactly."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_HANNING
    from kspecanal_tpu.ops.spectrum import curscan_auto_batched
    rng = np.random.default_rng(32)
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=256, sampling_rate=2.4e6,
                     window=WINDOW_HANNING,
                     cur_scan_non_overlap=0.5).finalize()
    raw_re = rng.integers(0, 256, (2, cfg.full_size), dtype=np.uint8)
    raw_im = rng.integers(0, 256, (2, cfg.full_size), dtype=np.uint8)
    got = curscan_auto_batched(jnp.asarray(raw_re), jnp.asarray(raw_im), cfg)
    want = curscan_auto_batched(
        jnp.asarray(raw_re.astype(np.float32) - 127.0),
        jnp.asarray(raw_im.astype(np.float32) - 127.0), cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-9)


def test_auto_dispatch_u8_tpu_fallthrough_decodes_once():
    """Regression: on a TPU backend with a config no fused/direct branch
    covers (fft > 256, full_size not a multiple of 128), the u8 decode
    inside the TPU block must not be applied a second time by the
    fall-through XLA-chain decode (x-254 corruption)."""
    from unittest import mock
    from kspecanal_tpu.config import SpecConfig, WINDOW_HANNING
    from kspecanal_tpu.ops import spectrum
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=1000,
                     sampling_rate=2.4e6, window=WINDOW_HANNING,
                     cur_scan_non_overlap=0.5, x_res=500).finalize()
    assert spectrum._fused_choice(cfg) is None
    rng = np.random.default_rng(33)
    raw_re = rng.integers(0, 256, (2, cfg.full_size), dtype=np.uint8)
    raw_im = rng.integers(0, 256, (2, cfg.full_size), dtype=np.uint8)
    want = spectrum.curscan_batched(
        jnp.asarray(raw_re.astype(np.float32) - 127.0),
        jnp.asarray(raw_im.astype(np.float32) - 127.0), cfg)
    with mock.patch.object(spectrum.jax, "default_backend", lambda: "tpu"):
        got = spectrum.curscan_auto_batched(
            jnp.asarray(raw_re), jnp.asarray(raw_im), cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-9)


def test_packed_kernel_odd_batch_pads_to_hw_tile():
    """Mosaic requires the out-block sublane dim (t_tile) divisible by 8;
    an odd T (quickFullScan: 1225 bands/sweep) must zero-pad rather than
    fall back to t_tile=2, which only interpret mode accepts (this
    crashed the real-TPU quickFullScan CLI).  Parity vs the XLA chain on
    an odd batch through the padding path."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_ONES
    from kspecanal_tpu.ops.pallas_curscan import (_auto_t_tile_packed,
                                                  curscan_fused_packed)
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=64, sampling_rate=2.4e6,
                     window=WINDOW_ONES, cur_scan_non_overlap=0.5,
                     x_res=64).finalize()
    assert _auto_t_tile_packed(cfg) % 8 == 0
    rng = np.random.default_rng(41)
    t = 13                                 # odd, < t_tile: full-pad path
    re = jnp.asarray(rng.standard_normal((t, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((t, cfg.full_size)), jnp.float32)
    got = np.asarray(curscan_fused_packed(re, im, cfg))
    want = np.asarray(jax.jit(
        lambda r, i: curscan_batched(r, i, cfg))(re, im))
    assert got.shape == (t, cfg.fft_size)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_kernel_u8_input_matches_decoded():
    """uint8 raw-plane input to the packed tiny-FFT kernel (in-VMEM
    decode) is bit-identical to decoding on the host first — including
    through the odd-batch zero-pad path (u8 pads with 127 -> 0.0)."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import (curscan_fused_packed,
                                                  supports_fused_packed)
    rng = np.random.default_rng(51)
    for fft, nono, t in ((64, 0.5, 13), (128, 0.5, 8), (64, 0.1, 5)):
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=nono, x_res=fft).finalize()
        assert supports_fused_packed(cfg)
        raw_re = rng.integers(0, 256, (t, cfg.full_size), dtype=np.uint8)
        raw_im = rng.integers(0, 256, (t, cfg.full_size), dtype=np.uint8)
        got = curscan_fused_packed(jnp.asarray(raw_re), jnp.asarray(raw_im),
                                   cfg)
        want = curscan_fused_packed(
            jnp.asarray(raw_re.astype(np.float32) - 127.0),
            jnp.asarray(raw_im.astype(np.float32) - 127.0), cfg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_dispatch_u8_reaches_packed_undecoded():
    """On a TPU backend, u8 planes for the packed regime (fft 64/128) must
    reach curscan_fused_packed STILL as uint8 (the in-VMEM decode is the
    point — pre-decoding would re-inflate HBM traffic 4x)."""
    from unittest import mock
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops import pallas_curscan, spectrum
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=64, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.5,
                     x_res=64).finalize()
    seen = []
    with mock.patch.object(spectrum.jax, "default_backend", lambda: "tpu"), \
         mock.patch.object(pallas_curscan, "curscan_fused_packed",
                           lambda r, i, c, **kw: seen.append(r.dtype)):
        raw = jnp.zeros((2, cfg.full_size), jnp.uint8)
        spectrum.curscan_auto_batched(raw, raw, cfg)
    assert seen == [jnp.uint8]


def test_sublane_default_bf16_staging_accuracy():
    """Deep-overlap DEFAULT runs stage the rotation stack in bf16 (the
    MXU casts DEFAULT operands to bf16 anyway); the result must stay
    within DEFAULT's error class (~1e-2 rel) of the f32 chain, and
    HIGHEST must remain exactly the f32 math (no staging)."""
    import dataclasses
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused_sublane
    from kspecanal_tpu.ops.spectrum import curscan_batched
    rng = np.random.default_rng(61)
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.1).finalize()
    re = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, cfg.full_size)), jnp.float32)
    want = np.asarray(curscan_batched(re, im, cfg))
    # HIGHEST: plain f32 in interpret mode -> tight match
    got_hi = np.asarray(curscan_fused_sublane(re, im, cfg, t_tile=1))
    np.testing.assert_allclose(got_hi, want, rtol=5e-5, atol=1e-9)
    # DEFAULT: bf16-staged rotations -> DEFAULT-class error, not garbage
    cfg_d = dataclasses.replace(cfg, tpu_precision="DEFAULT")
    got_d = np.asarray(curscan_fused_sublane(re, im, cfg_d, t_tile=1))
    rel = np.max(np.abs(got_d - want)) / np.max(np.abs(want))
    assert rel < 2e-2, rel
    assert rel > 0  # and it IS the bf16 path, not silently f32


def test_sublane_ablate_concat_matches_baseline():
    """The kernel_ablate 'concat' variant (per-block dots, no cross-block
    restacks) is the same math in different shapes — must match the
    production kernel exactly.  Guards the perf-forensics tool
    (scripts/kernel_ablate.py) against drifting from the kernel."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused_sublane
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.5,
                     x_res=512, tpu_precision="DEFAULT").finalize()
    rng = np.random.default_rng(11)
    re = jnp.asarray(rng.integers(0, 256, (4, cfg.full_size), np.uint8))
    im = jnp.asarray(rng.integers(0, 256, (4, cfg.full_size), np.uint8))
    base = curscan_fused_sublane(re, im, cfg)
    got = curscan_fused_sublane(re, im, cfg, ablate=("concat",))
    # same math; only the dots' lane grouping changes, so any delta is
    # accumulation-order float noise (cf. test_fused_t_tile_matches_untiled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-6, atol=1e-9)


def test_threemult_gate_per_path():
    """Pin the hardware-measured 3M gate (round 5): HIGH uses 3M
    everywhere, DEFAULT everywhere except deep-overlap u8.  In interpret
    mode 3M and 4M differ by f32 rounding, so bit-equality against the
    force3m/no3m overrides detects which form the production gate picked."""
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.ops.pallas_curscan import curscan_fused_sublane

    def run(nono, prec, u8, ablate=()):
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=nono, x_res=512,
                         tpu_precision=prec).finalize()
        rng = np.random.default_rng(13)
        if u8:
            re = jnp.asarray(rng.integers(0, 256, (2, cfg.full_size),
                                          np.uint8))
            im = jnp.asarray(rng.integers(0, 256, (2, cfg.full_size),
                                          np.uint8))
        else:
            re = jnp.asarray(rng.standard_normal(
                (2, cfg.full_size)).astype(np.float32))
            im = jnp.asarray(rng.standard_normal(
                (2, cfg.full_size)).astype(np.float32))
        return np.asarray(curscan_fused_sublane(re, im, cfg,
                                                ablate=ablate))

    cases = [
        (0.5, "DEFAULT", True, "force3m"),   # aligned DEFAULT: 3M
        (0.1, "DEFAULT", False, "force3m"),  # deep DEFAULT f32: 3M
        (0.1, "DEFAULT", True, "no3m"),      # deep DEFAULT u8: 4M
        (0.1, "HIGH", False, "force3m"),     # HIGH everywhere: 3M
        (0.5, "HIGHEST", False, "no3m"),     # HIGHEST: exact 4-pass
    ]
    for nono, prec, u8, expect in cases:
        prod = run(nono, prec, u8)
        want = run(nono, prec, u8, ablate=(expect,))
        other = "no3m" if expect == "force3m" else "force3m"
        np.testing.assert_array_equal(
            prod, want, err_msg=f"{nono}/{prec}/u8={u8} gate mismatch")
        # sanity: the two forms really differ, so the equality above is
        # a meaningful discriminator (f32 rounding separates them)
        assert not np.array_equal(want, run(nono, prec, u8,
                                            ablate=(other,))), \
            f"{nono}/{prec}/u8={u8}: 3M and 4M unexpectedly identical"
