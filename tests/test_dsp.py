"""data_proc / plot-compress transforms vs the float64 oracle
(kspecanal.py:88-237 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from kspecanal_tpu.ops import dsp
from oracle import (oracle_compress_1d, oracle_conv_smooth,
                    oracle_hist_low_clip, oracle_log_no_gain)


def test_hist_low_clip_matches(rng):
    v = rng.standard_normal(512) * 10
    got = np.asarray(jax.jit(dsp.hist_low_clip)(jnp.asarray(v, jnp.float32)))
    want = oracle_hist_low_clip(v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_log_no_gain_inf_replacement(rng):
    v = np.abs(rng.standard_normal(64))
    v[5] = 0.0  # -> -inf before replacement
    got = np.asarray(jax.jit(
        lambda x: dsp.log_no_gain(x, 19.1, inf_to=0.0))(
            jnp.asarray(v, jnp.float32)))
    want = oracle_log_no_gain(np.array(v), 19.1, inf_to=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got[5] == 0.0  # the reference replaces AFTER gain subtraction
    # without replacement, -inf survives (zero_span path, kspecanal.py:469)
    got2 = np.asarray(jax.jit(
        lambda x: dsp.log_no_gain(x, 19.1))(jnp.asarray(v, jnp.float32)))
    assert np.isneginf(got2[5])


def test_conv_smooth_matches(rng):
    v = rng.standard_normal(512)
    got = np.asarray(jax.jit(dsp.conv_smooth)(jnp.asarray(v, jnp.float32)))
    want = oracle_conv_smooth(v)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
    # first/last 12 points pinned to the mean (kspecanal.py:118-120)
    assert np.allclose(got[:12], got[0])
    assert np.allclose(got[-12:], got[-1])


def test_compress_modes_match(rng):
    v = rng.standard_normal(1024)
    for mode in ("MAX", "MIN", "AVG"):
        got = np.asarray(jax.jit(
            lambda x: dsp.compress_1d(x, mode, 256))(
                jnp.asarray(v, jnp.float32)))
        want = oracle_compress_1d(v, mode, 256)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # RAW passthrough; short data passthrough (cols==0 guard :191-192)
    assert dsp.compress_1d(jnp.asarray(v), "RAW", 256).shape == (1024,)
    short = jnp.asarray(v[:100])
    assert dsp.compress_1d(short, "MAX", 256).shape == (100,)


def test_compress_xy_x_blindly_averaged(rng):
    """x is always AVG-compressed regardless of the y mode
    (kspecanal.py:219-221)."""
    x = jnp.asarray(np.linspace(0, 1, 1024), jnp.float32)
    y = jnp.asarray(rng.standard_normal(1024), jnp.float32)
    xc, yc = jax.jit(lambda a, b: dsp.compress_xy(a, b, "MAX", 256))(x, y)
    np.testing.assert_allclose(
        np.asarray(xc),
        oracle_compress_1d(np.asarray(x, np.float64), "AVG", 256), rtol=1e-5)
    assert yc.shape == (256,)


def test_dispproc_chain(rng):
    """Dot-separated chains apply in order (kspecanal.py:150-165)."""
    v = np.abs(rng.standard_normal(128)) + 1e-6
    got = np.asarray(jax.jit(
        lambda x: dsp.fftvals_dispproc(x, "HistLowClip.LogNoGain",
                                       gain=10.0))(jnp.asarray(v, jnp.float32)))
    want = oracle_log_no_gain(oracle_hist_low_clip(v), 10.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_heatmap_width():
    assert dsp.heatmap_width(16384, 512, "MAX") == 512
    assert dsp.heatmap_width(256, 512, "MAX") == 256
    assert dsp.heatmap_width(16384, 512, "RAW") == 16384
