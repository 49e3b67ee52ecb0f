"""Regression tests for the round-1 code-review findings: checkpoint path
suffix, mid-run curve enabling, scan heatmap baseline adjustment, prefetch
retune staleness, per-frame record timestamps, renderer path casing,
native-build fallback, and the zero-span display-proc chain."""
import dataclasses
import os
import subprocess

import numpy as np
import pytest

from kspecanal_tpu.config import SpecConfig
from kspecanal_tpu.io.sources import SynthIQSource


def _zs_cfg(**kw):
    base = dict(prg_mode="ZEROSPAN", fft_size=128, sampling_rate=2.4e6,
                x_res=128)
    base.update(kw)
    return SpecConfig(**base).finalize()


def test_checkpoint_path_without_npz_suffix(tmp_path):
    """np.savez appends .npz; save and resume must agree on the real
    filename or `tpuStateFile /tmp/ck` silently never resumes."""
    from kspecanal_tpu import session as sess_mod
    from kspecanal_tpu.io.state import load_state, save_state, state_path
    from kspecanal_tpu.models import zerospan as zs

    cfg = _zs_cfg()
    state = zs.init_state(cfg)
    p = str(tmp_path / "ck")          # no extension
    save_state(p, state, cfg)
    assert os.path.exists(state_path(p))
    assert load_state(p, cfg) is not None
    # the session resume path finds it under the un-suffixed name too
    sess = sess_mod.Session(cfg, None, state_file=p)
    assert sess._resume_state(cfg, "zerospan") is not None


def test_checkpoint_old_layout_starts_fresh(tmp_path):
    """A checkpoint written before a state field existed is refused (warn +
    fresh start), not a KeyError crash."""
    from kspecanal_tpu.io.state import _fingerprint, load_state
    from kspecanal_tpu.models import zerospan as zs

    cfg = _zs_cfg()
    state = zs.init_state(cfg)
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    del arrays["seeded"]              # simulate the older layout
    p = str(tmp_path / "old.npz")
    np.savez(p, __kind__="zerospan", __fingerprint__=_fingerprint(cfg),
             **arrays)
    assert load_state(p, cfg) is None


def test_curve_enabled_midrun_first_copies(rng):
    """Enabling a curve after iteration 0 must first-copy (reference: its
    Fft.* is still None then, kspecanal.py:133-134) — not cumulate against
    the zeros init seed, which would pin Max at 0 dB forever."""
    import jax.numpy as jnp
    from kspecanal_tpu.models import zerospan as zs

    cfg = _zs_cfg(b_data_max=False)
    state = zs.init_state(cfg)
    spec = jnp.asarray(rng.uniform(1e-6, 1e-3, cfg.fft_size), jnp.float32)
    for _ in range(2):
        state, _ = zs.display_update(state, spec, cfg)
    assert np.all(np.asarray(state.fft_max) == 0.0)  # untouched while off

    cfg_on = dataclasses.replace(cfg, b_data_max=True)
    spec2 = jnp.asarray(rng.uniform(1e-6, 1e-3, cfg.fft_size), jnp.float32)
    state, _ = zs.display_update(state, spec2, cfg_on)
    from kspecanal_tpu.ops import dsp
    expect = np.asarray(dsp.log_no_gain(spec2, cfg.gain))
    np.testing.assert_allclose(np.asarray(state.fft_max), expect, rtol=1e-6)
    assert np.all(np.asarray(state.fft_max) < 0.0)  # not pinned at the seed
    # and from here on it cumulates normally
    state, _ = zs.display_update(state, spec, cfg_on)
    assert np.all(np.asarray(state.fft_max) >= expect - 1e-5)


def test_zero_span_disp_proc_chain_honored(rng):
    """cfg.zero_span_disp_proc (gZeroSpanFftDispProcMode) drives the display
    transform — a 'LogNoGain.HistLowClip' chain must differ from the
    hard-coded LogNoGain and match the dsp chain exactly."""
    import jax.numpy as jnp
    from kspecanal_tpu.models import zerospan as zs
    from kspecanal_tpu.ops import dsp

    spec = jnp.asarray(rng.uniform(1e-6, 1e-3, 128), jnp.float32)
    cfg = _zs_cfg(zero_span_disp_proc="LogNoGain.HistLowClip")
    state, _ = zs.display_update(zs.init_state(cfg), spec, cfg)
    expect = np.asarray(dsp.fftvals_dispproc(
        spec, "LogNoGain.HistLowClip", gain=cfg.gain))
    np.testing.assert_allclose(np.asarray(state.fft_cur), expect, rtol=1e-6)
    plain = np.asarray(dsp.log_no_gain(spec, cfg.gain))
    assert not np.allclose(expect, plain)


def test_scan_heatmap_row_is_baseline_adjusted(rng):
    """The scan-mode waterfall row compresses the baseline-ADJUSTED Avg
    (kspecanal.py:670,696-697), not the raw accumulated Avg."""
    import jax.numpy as jnp
    from kspecanal_tpu.models import scan as scan_mod
    from kspecanal_tpu.ops import dsp

    cfg = SpecConfig(prg_mode="SCAN", start_freq=88e6, end_freq=92e6,
                     sampling_rate=2e6, fft_size=64, x_res=64,
                     cur_scan_non_overlap=0.5,
                     scan_range_non_overlap=0.5).finalize()
    plan = scan_mod.make_scan_plan(cfg)
    b = plan.num_bands
    re = jnp.asarray(rng.standard_normal((b, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((b, cfg.full_size)), jnp.float32)
    oks = jnp.ones(b, bool)
    adj = jnp.asarray(rng.uniform(1.0, 5.0, plan.total_entries), jnp.float32)

    state = scan_mod.init_state(cfg, plan)
    state = scan_mod.sweep_step_jit(state, re, im, oks, cfg, plan, adj)
    row = np.asarray(state.heatmap[0])
    expect = np.asarray(dsp.compress_1d(state.fft_avg - adj,
                                        cfg.plt_compress_hm, cfg.x_res))
    np.testing.assert_allclose(row, expect, rtol=1e-6)
    # without a baseline the row is the raw Avg (distinct from the above)
    s0 = scan_mod.init_state(cfg, plan)
    s0 = scan_mod.sweep_step_jit(s0, re, im, oks, cfg, plan)
    row0 = np.asarray(s0.heatmap[0])
    assert not np.allclose(row, row0)
    np.testing.assert_allclose(
        row0, np.asarray(dsp.compress_1d(s0.fft_avg, cfg.plt_compress_hm,
                                         cfg.x_res)), rtol=1e-6)


def test_prefetch_discards_pre_retune_blocks():
    """A block the worker read at the old tuning but enqueued AFTER the
    retune drained the queue must not be served to the consumer."""
    from kspecanal_tpu.io.prefetch import PrefetchingSource

    inner = SynthIQSource(center_freq=92e6, sample_rate=2.4e6, seed=5)
    src = PrefetchingSource(inner, block_size=2048, depth=4)
    try:
        src.read(2048)                       # worker warmed up
        assert src.retune(95e6, 2.4e6, 10.0)  # epoch -> 1, queue drained
        marker = (np.full(2048, -12345.0, np.float32),
                  np.full(2048, -12345.0, np.float32))
        src._q.put((0, marker, False))       # stale late-enqueued block
        re, _ = src.read(2048)
        assert not np.any(re == -12345.0)
    finally:
        src.close()


def test_record_timestamps_are_per_frame(tmp_path):
    """Recorded frames carry their own capture timestamps (the reference
    stamps every iteration, kspecanal.py:516-525) — not one shared
    per-chunk time that plateaus replay xlabels in 8-frame steps."""
    from kspecanal_tpu import session as sess_mod
    from kspecanal_tpu.io.replay import ZeroSpanPlayer

    p = str(tmp_path / "s.save")
    cfg = _zs_cfg(fft_size=1024, zero_span_save_file=p,
                  prg_mode="ZEROSPANSAVE")
    src = SynthIQSource(center_freq=cfg.center_freq,
                        sample_rate=cfg.sampling_rate, seed=3)
    sess = sess_mod.Session(cfg, src)
    assert sess_mod.run_zero_span_save(sess, max_iters=8) == 8
    with ZeroSpanPlayer(p) as player:
        stamps = [ts for ts, _ in player.frames()]
    assert len(stamps) == 8
    assert stamps == sorted(stamps)
    assert len(set(stamps)) > 1


def test_renderer_png_path_case_preserved():
    """tpuRenderer values lowercase only the scheme: the png:<dir> form
    embeds a case-sensitive directory path."""
    from kspecanal_tpu.cli import parse_args

    _, run = parse_args(["zeroSpan", "tpuRenderer", "PNG:/Data/CaseDir"])
    assert run.renderer == "png:/Data/CaseDir"
    _, run2 = parse_args(["zeroSpan", "tpuRenderer", "TERM"])
    assert run2.renderer == "term"


def test_native_build_failure_raises_oserror(monkeypatch, tmp_path):
    """A failed `make` maps to OSError so every caller's documented
    fallback contract (`except (OSError, ImportError)` -> NumPy reader)
    actually catches it."""
    from kspecanal_tpu.io import native_iq

    def boom(*a, **k):
        raise subprocess.CalledProcessError(2, "make", stderr=b"no g++")

    monkeypatch.setattr(native_iq, "_lib", None)
    monkeypatch.setattr(native_iq, "_LIB_PATH",
                        str(tmp_path / "missing" / "lib.so"))
    monkeypatch.setattr(native_iq.subprocess, "run", boom)
    with pytest.raises(OSError, match="build failed"):
        native_iq._load()


def test_bench_compact_keeps_driver_line_parseable():
    """bench._compact guards the driver artifact: notes move to stderr,
    floats round to 4 significant digits, and non-finite values become
    null (bare NaN would make the whole line unparseable — the failure
    mode that cost round 4 its machine-readable benchmark)."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), os.pardir,
                                 "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    result = {
        "value": 1.23456789e10,
        "details": {
            "a": {"tpu": 3.14159e9, "note": "long prose " * 50},
            "b": {"marginal": float("nan")},
            "c": {"tpu": float("inf")},
        },
        "methodology": "stderr-only",
    }
    out = m._compact(result)
    line = json.dumps(out)
    assert json.loads(line) == out              # strict JSON round-trip
    assert "NaN" not in line and "Infinity" not in line
    assert out["details"]["b"]["marginal"] is None
    assert out["details"]["c"]["tpu"] is None
    assert out["value"] == 12350000000.0        # 4 significant digits
    assert "note" not in out["details"]["a"]
    assert "methodology" not in out
