"""Mode state machines vs the serial oracles: zero-span curve cumulation,
record/replay round-trip (the reference's regression harness, SURVEY.md §4.3),
and the scan-range overlap stitch."""
import dataclasses
import os

import numpy as np
import jax.numpy as jnp

from kspecanal_tpu.config import (MODE_SCAN, SpecConfig, WINDOW_HANNING,
                                  window_lut)
from kspecanal_tpu.io.replay import ZeroSpanPlayer, ZeroSpanRecorder
from kspecanal_tpu.io.sources import FlakySource, SynthIQSource
from kspecanal_tpu.models import scan as scan_mod
from kspecanal_tpu.models import zerospan as zs
from kspecanal_tpu import session as sess_mod
from oracle import (oracle_curscan, oracle_scan_sweeps,
                    oracle_zero_span_iters)


def zs_cfg(**kw):
    base = dict(prg_mode="ZEROSPAN", fft_size=256, sampling_rate=2.4e6,
                window=WINDOW_HANNING, cur_scan_non_overlap=0.5,
                x_res=256)
    base.update(kw)
    return SpecConfig(**base).finalize()


def test_zero_span_curves_match_oracle(rng):
    cfg = zs_cfg()
    blocks = [(rng.standard_normal(cfg.full_size)
               + 1j * rng.standard_normal(cfg.full_size)) for _ in range(7)]
    # Device path
    state = zs.init_state(cfg)
    for b in blocks:
        state, view = zs.zero_span_step_jit(
            state, jnp.asarray(b.real, jnp.float32),
            jnp.asarray(b.imag, jnp.float32), cfg)
    # Oracle path: serial curscans then serial display cumulation
    win = window_lut(cfg.window, cfg.fft_size)
    specs = [oracle_curscan(b, cfg.fft_size, cfg.cur_scan_non_overlap, win,
                            cfg.cur_scan_cumu_mode) for b in blocks]
    fmax, fmin, favg, fcur = oracle_zero_span_iters(specs, cfg.gain)
    np.testing.assert_allclose(np.asarray(state.fft_max), fmax, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.fft_min), fmin, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.fft_avg), favg, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.fft_cur), fcur, atol=2e-3)
    # Heatmap ring advanced 7 rows
    assert int(state.hm_index) == 7
    assert int(state.iteration) == 7


def test_heatmap_ring_wraps(rng):
    cfg = zs_cfg(fft_size=64, x_res=64)
    state = zs.init_state(cfg)
    b = rng.standard_normal(cfg.full_size) + 1j * rng.standard_normal(cfg.full_size)
    re, im = jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32)
    for i in range(130):
        state, _ = zs.zero_span_step_jit(state, re, im, cfg)
    assert int(state.hm_index) == 130 % 128
    assert int(state.iteration) == 130


def test_record_replay_roundtrip(tmp_path, rng):
    """zeroSpanSave then zeroSpanPlay must rebuild identical curves — the
    reference's deterministic regression mechanism (kspecanal.py:509-564)."""
    save_file = str(tmp_path / "session.zerospansave")
    cfg = zs_cfg(zero_span_save_file=save_file, zero_span_play_file=save_file,
                 prg_mode="ZEROSPANSAVE")
    src = SynthIQSource(center_freq=cfg.center_freq,
                        sample_rate=cfg.sampling_rate, gain=0.5, seed=7)
    sess = sess_mod.Session(cfg, src)
    n = sess_mod.run_zero_span_save(sess, max_iters=5)
    assert n == 5

    # Header round-trip
    player = ZeroSpanPlayer(save_file)
    assert player.header.center_freq == cfg.center_freq
    assert player.header.sampling_rate == cfg.sampling_rate
    assert player.header.gain == cfg.gain
    frames = list(player.frames())
    player.close()
    assert len(frames) == 5
    assert frames[0][1].shape == (cfg.fft_size,)

    # Play mode reconstructs the zero-span state from the recorded frames.
    views = []
    play_cfg = dataclasses.replace(cfg, prg_mode="ZEROSPANPLAY")
    sess2 = sess_mod.Session(
        play_cfg, None,
        renderer=lambda s, v, p, i, ts: views.append((v, ts)))
    state = sess_mod.run_zero_span_play(sess2)
    assert int(state.iteration) == 5
    # Oracle from the recorded linear spectra
    fmax, fmin, favg, fcur = oracle_zero_span_iters(
        [f[1] for f in frames], cfg.gain)
    np.testing.assert_allclose(np.asarray(state.fft_avg), favg, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.fft_max), fmax, atol=2e-3)
    assert len(views) == 5
    assert views[0][1] is not None  # timestamp string present


def scan_cfg(**kw):
    base = dict(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=96e6,
                sampling_rate=2e6, fft_size=128, x_res=128,
                window=WINDOW_HANNING, cur_scan_non_overlap=0.5,
                scan_range_non_overlap=0.5)
    base.update(kw)
    return SpecConfig(**base).finalize()


def test_scan_plan_geometry():
    cfg = scan_cfg()
    plan = scan_mod.make_scan_plan(cfg)
    # 4 groups of 2 MHz over 88-96; overlap 0.5 -> the reference's while
    # loop runs 8 bands (the last pokes past the grid and its source slice
    # shrinks, kspecanal.py:626-629).
    assert plan.num_groups == 4
    assert plan.total_entries == 4 * 128
    assert plan.num_bands == 8
    b0, b1 = plan.bands[0], plan.bands[1]
    assert (b0.i_start, b0.i_end, b0.i_old_end) == (0, 128, 0)
    assert (b1.i_start, b1.i_end, b1.i_old_end) == (64, 192, 128)
    last = plan.bands[-1]
    assert last.i_start == 448 and last.i_end == 576
    assert last.s_end == plan.total_entries - last.i_start  # shrunk to 64
    # Band centers step by fS/2
    assert plan.bands[0].center_freq == 89e6
    assert abs(plan.bands[1].center_freq - 90e6) < 1e-6


def test_scan_endfreq_rounding():
    """FM preset: 88-108 MHz at 2.4 Msps rounds endFreq to 109.6 MHz
    (kspecanal.py:701-709)."""
    cfg = SpecConfig(prg_mode="FMSCAN", sampling_rate=2.4e6,
                     fft_size=512).finalize()
    assert cfg.prg_mode == MODE_SCAN
    assert cfg.start_freq == 88e6
    assert abs(cfg.end_freq - 109.6e6) < 1e-3
    assert cfg.center_freq == (88e6 + 109.6e6) / 2


def test_scan_stitch_matches_oracle(rng):
    cfg = scan_cfg()
    plan = scan_mod.make_scan_plan(cfg)
    win = window_lut(cfg.window, cfg.fft_size)
    sweeps_iq = []
    for _ in range(3):
        sweeps_iq.append([
            rng.standard_normal(cfg.full_size)
            + 1j * rng.standard_normal(cfg.full_size)
            for _ in range(plan.num_bands)])
    # Device path
    state = scan_mod.init_state(cfg, plan)
    for sweep in sweeps_iq:
        re = jnp.asarray(np.stack([b.real for b in sweep]), jnp.float32)
        im = jnp.asarray(np.stack([b.imag for b in sweep]), jnp.float32)
        oks = jnp.ones(plan.num_bands, bool)
        state = scan_mod.sweep_step_jit(state, re, im, oks, cfg, plan)
    # Oracle path
    per_sweep = []
    for sweep in sweeps_iq:
        per_sweep.append(np.stack([
            oracle_curscan(b, cfg.fft_size, cfg.cur_scan_non_overlap, win,
                           cfg.cur_scan_cumu_mode) for b in sweep]))
    want = oracle_scan_sweeps(per_sweep, cfg)
    np.testing.assert_allclose(np.asarray(state.fft_cur), want["Cur"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.fft_max), want["Max"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.fft_min), want["Min"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.fft_avg), want["Avg"], atol=5e-3)
    assert int(state.sweep) == 3


def test_scan_retune_failure_sentinel(rng):
    """Failed retunes produce the all-ones (-gain dB) sentinel band and the
    sweep keeps going (kspecanal.py:635-639)."""
    cfg = scan_cfg()
    src = FlakySource(SynthIQSource(sample_rate=cfg.sampling_rate, seed=3),
                      fail_every=1)  # every retune fails
    sess = sess_mod.Session(cfg, src)
    state = sess_mod.run_scan(sess, max_sweeps=1)
    # Every band sentinel-filled with ones -> whole stitched Cur is exactly
    # LogNoGain(1) = -gain dB (overlap averages of equal values are equal).
    cur = np.asarray(state.fft_cur)
    assert np.allclose(cur, -cfg.gain, atol=1e-4)


def test_scan_via_session_driver(rng):
    cfg = scan_cfg()
    views = []
    src = SynthIQSource(sample_rate=cfg.sampling_rate, seed=11)
    sess = sess_mod.Session(cfg, src,
                            renderer=lambda s, v, p, i, ts: views.append(v))
    state = sess_mod.run_scan(sess, max_sweeps=2)
    assert int(state.sweep) == 2
    assert len(views) == 2
    assert views[0].heatmap.shape[0] == 128


def test_zero_span_use_psd_path(rng):
    """bUsePSD swaps curscan for the Welch PSD (kspecanal.py:374-384)."""
    import jax
    from kspecanal_tpu.ops.spectrum import psd_welch
    from kspecanal_tpu.ops.dsp import log_no_gain
    cfg = zs_cfg(b_use_psd=True)
    b = rng.standard_normal(cfg.full_size) + 1j * rng.standard_normal(cfg.full_size)
    re, im = jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32)
    state = zs.init_state(cfg)
    state, view = zs.zero_span_step_jit(state, re, im, cfg)
    want = jax.jit(lambda r, i: log_no_gain(psd_welch(r, i, cfg), cfg.gain))(re, im)
    np.testing.assert_allclose(np.asarray(state.fft_cur), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scan_use_psd_path(rng):
    """bUsePSD applies inside scan mode too: the reference's PSD cross-check
    lives in ``sdr_curscan`` (kspecanal.py:636 -> :374-384), so every
    band's spectrum must come from the Welch PSD when the flag is set
    (round-2 VERDICT missing item 1)."""
    import jax
    from kspecanal_tpu.ops import dsp
    from kspecanal_tpu.ops.spectrum import psd_welch
    cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=92e6,
                     sampling_rate=2e6, fft_size=256, x_res=256,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5,
                     b_use_psd=True).finalize()
    plan = scan_mod.make_scan_plan(cfg)
    b = plan.num_bands
    re = jnp.asarray(rng.standard_normal((b, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((b, cfg.full_size)), jnp.float32)
    oks = jnp.ones(b, bool)
    got = scan_mod.band_spectra(re, im, oks, cfg)
    # the flag must change the output (it was silently ignored before)
    off = scan_mod.band_spectra(
        re, im, oks, dataclasses.replace(cfg, b_use_psd=False))
    assert not np.allclose(np.asarray(got), np.asarray(off))
    # and match the PSD display chain (psd_welch itself is mlab-parity
    # tested in test_spectrum.test_psd_welch_matches_mlab)
    lin = jax.vmap(lambda r, i: psd_welch(r, i, cfg))(re, im)
    lin = dsp.clip2minamp(lin, cfg.min_amp4clip)
    want = dsp.fftvals_dispproc(lin, cfg.scan_disp_proc, gain=cfg.gain,
                                inf_to=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scan_render_every_band(rng):
    """tpuRenderEvery band restores the reference's per-band redraw
    cadence (kspecanal.py:670-688): num_bands interim views (no peak
    spam — plot_highs is per-sweep, :694) + 1 sweep view per sweep, with
    a final state identical to the batched per-sweep path."""
    cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=92e6,
                     sampling_rate=2e6, fft_size=128, x_res=128,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5).finalize()
    plan = scan_mod.make_scan_plan(cfg)
    sweeps = 2

    def run(render_every):
        views = []
        src = SynthIQSource(sample_rate=cfg.sampling_rate, seed=23)
        sess = sess_mod.Session(
            cfg, src, renderer=lambda s, v, p, i, ts: views.append(v),
            render_every=render_every)
        state = sess_mod.run_scan(sess, max_sweeps=sweeps)
        return state, views

    st_band, views_band = run("band")
    st_sweep, views_sweep = run("sweep")
    assert len(views_sweep) == sweeps
    assert len(views_band) == sweeps * (plan.num_bands + 1)
    for f in st_sweep._fields:
        np.testing.assert_allclose(np.asarray(getattr(st_band, f)),
                                   np.asarray(getattr(st_sweep, f)),
                                   rtol=2e-5, atol=2e-5, err_msg=f)
    # the LAST interim view of a sweep equals the sweep view's curves
    last_interim = views_band[plan.num_bands - 1]
    sweep_view = views_band[plan.num_bands]
    np.testing.assert_allclose(np.asarray(last_interim.cur_lvls),
                               np.asarray(sweep_view.cur_lvls),
                               rtol=1e-6, atol=1e-6)


def test_gathered_stitch_matches_sequential(rng):
    """The vectorized 2-gather sweep stitch (round 3) is bit-for-math
    identical to the sequential band fold wherever its static plan
    applies, and correctly refuses geometries it cannot represent
    (deep band overlap < 0.5, raw-base cumulation)."""
    for ovl, raw_base, expect_fast in [(0.5, False, True),
                                       (0.75, False, True),
                                       (0.25, False, False),
                                       (0.5, True, False)]:
        cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=96e6,
                         sampling_rate=2e6, fft_size=128, x_res=128,
                         window=WINDOW_HANNING, cur_scan_non_overlap=0.5,
                         scan_range_non_overlap=ovl,
                         b_scan_range_base_data_is_raw=raw_base).finalize()
        plan = scan_mod.make_scan_plan(cfg)
        tbl = scan_mod._gather_stitch_plan(cfg, plan)
        assert (tbl is not None) == expect_fast, (ovl, raw_base)
        s, b = 3, plan.num_bands
        re = jnp.asarray(rng.standard_normal((s, b, cfg.full_size)),
                         jnp.float32)
        im = jnp.asarray(rng.standard_normal((s, b, cfg.full_size)),
                         jnp.float32)
        oks = np.ones((s, b), bool)
        oks[1, min(2, b - 1)] = False   # sentinel band inside the batch
        adj = jnp.asarray(rng.standard_normal(plan.total_entries),
                          jnp.float32)
        st_seq = scan_mod.init_state(cfg, plan)
        for i in range(s):
            st_seq = scan_mod.sweep_step_jit(
                st_seq, re[i], im[i], jnp.asarray(oks[i]), cfg, plan, adj)
        st_bat = scan_mod.init_state(cfg, plan)
        st_bat = scan_mod.sweep_steps_jit(st_bat, re, im, jnp.asarray(oks),
                                          cfg, plan, adj)
        for f in st_seq._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(st_bat, f)),
                np.asarray(getattr(st_seq, f)), rtol=2e-5, atol=2e-5,
                err_msg=f"{f} ovl={ovl} raw={raw_base}")


def test_scan_fast_path_matches_unrolled(rng):
    """The lax.scan stitch (used for >64-band sweeps) == the unrolled fold."""
    import kspecanal_tpu.models.scan as scan_module
    # 40 groups -> 80 bands: above a temporarily-lowered unroll threshold
    cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=100e6, end_freq=180e6,
                     sampling_rate=2e6, fft_size=64, x_res=64,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5,
                     scan_range_non_overlap=0.5).finalize()
    plan = scan_mod.make_scan_plan(cfg)
    assert plan.num_bands > 64
    B = plan.num_bands
    re = jnp.asarray(rng.standard_normal((B, cfg.full_size)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((B, cfg.full_size)), jnp.float32)
    oks = jnp.ones(B, bool)
    # fast path (default threshold)
    s_fast = scan_mod.init_state(cfg, plan)
    for _ in range(2):
        s_fast = scan_mod.sweep_step_jit(s_fast, re, im, oks, cfg, plan)
    # force unrolled
    old = scan_module._UNROLL_MAX_BANDS
    scan_module._UNROLL_MAX_BANDS = 10_000
    scan_mod.sweep_step_jit.clear_cache()
    try:
        s_slow = scan_mod.init_state(cfg, plan)
        for _ in range(2):
            s_slow = scan_mod.sweep_step_jit(s_slow, re, im, oks, cfg, plan)
    finally:
        scan_module._UNROLL_MAX_BANDS = old
        scan_mod.sweep_step_jit.clear_cache()
    for a, b in zip(s_fast[:5], s_slow[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_quickfullscan_plan_compiles(rng):
    """The quickFullScan preset (30e6-1.5e9, fftSize 64 -> 1225 bands) must
    build its plan and run one sweep in reasonable time via the fast path."""
    from kspecanal_tpu.cli import parse_args
    cfg, _ = parse_args(["quickFullScan"])
    plan = scan_mod.make_scan_plan(cfg)
    assert plan.num_bands > 1000
    B = plan.num_bands
    re = jnp.zeros((B, cfg.full_size), jnp.float32)
    im = jnp.zeros((B, cfg.full_size), jnp.float32)
    oks = jnp.ones(B, bool)
    state = scan_mod.init_state(cfg, plan)
    state = scan_mod.sweep_step_jit(state, re, im, oks, cfg, plan)
    assert state.fft_cur.shape == (plan.total_entries,)


def test_scan_session_with_band_mesh(rng):
    """Session driver runs the band-sharded sweep when a mesh is provided."""
    from kspecanal_tpu.parallel.mesh import make_mesh
    cfg = scan_cfg()
    src = SynthIQSource(sample_rate=cfg.sampling_rate, seed=12)
    mesh = make_mesh(time=1, band=4)
    sess = sess_mod.Session(cfg, src, mesh=mesh)
    state = sess_mod.run_scan(sess, max_sweeps=1)
    # equal to the unsharded driver on the same source sequence
    src2 = SynthIQSource(sample_rate=cfg.sampling_rate, seed=12)
    sess2 = sess_mod.Session(cfg, src2)
    state2 = sess_mod.run_scan(sess2, max_sweeps=1)
    np.testing.assert_allclose(np.asarray(state.fft_cur),
                               np.asarray(state2.fft_cur),
                               rtol=1e-5, atol=1e-5)


def test_scan_stitch_base_data_raw_matches_oracle(rng):
    """bScanRangeBaseDataIsRaw=True: Max/Min/Avg cumulate from the raw band
    spectrum over [iStart:iEnd] instead of stitched Cur over [iStart:iDone]
    (kspecanal.py:651-656)."""
    cfg = scan_cfg(b_scan_range_base_data_is_raw=True)
    plan = scan_mod.make_scan_plan(cfg)
    win = window_lut(cfg.window, cfg.fft_size)
    sweeps_iq = [[rng.standard_normal(cfg.full_size)
                  + 1j * rng.standard_normal(cfg.full_size)
                  for _ in range(plan.num_bands)] for _ in range(2)]
    state = scan_mod.init_state(cfg, plan)
    for sweep in sweeps_iq:
        re = jnp.asarray(np.stack([b.real for b in sweep]), jnp.float32)
        im = jnp.asarray(np.stack([b.imag for b in sweep]), jnp.float32)
        state = scan_mod.sweep_step_jit(
            state, re, im, jnp.ones(plan.num_bands, bool), cfg, plan)
    per_sweep = [np.stack([
        oracle_curscan(b, cfg.fft_size, cfg.cur_scan_non_overlap, win,
                       cfg.cur_scan_cumu_mode) for b in sweep])
        for sweep in sweeps_iq]
    want = oracle_scan_sweeps(per_sweep, cfg)
    np.testing.assert_allclose(np.asarray(state.fft_max), want["Max"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.fft_min), want["Min"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.fft_avg), want["Avg"], atol=5e-3)


def test_amplitude_calibration(rng):
    """A bin-centered unit complex exponential measures 2.0 in the linear
    spectrum (the winAdj*2*|fft|/N convention, kspecanal.py:391; the +3dB
    IQ note of README.rst:373-376 follows from it)."""
    cfg = zs_cfg(window="WIN.ONES", cur_scan_cumu_mode="AVG")
    n = cfg.full_size
    k = 16  # exact bin of the fft (fftSize divides full_size)
    t = np.arange(n)
    z = np.exp(2j * np.pi * k * t / cfg.fft_size)  # amplitude 1.0
    state = zs.init_state(cfg)
    spec = None
    import jax
    from kspecanal_tpu.ops.spectrum import curscan_jit
    spec = np.asarray(curscan_jit(jnp.asarray(z.real, jnp.float32),
                                  jnp.asarray(z.imag, jnp.float32), cfg))
    assert abs(spec.max() - 2.0) < 1e-3
    assert int(np.argmax(spec)) == cfg.fft_size // 2 + k


def test_scan_baseline_roundtrip(tmp_path, rng):
    """saveSigLvls in scan mode then adjSigLvls on the same range loads and
    subtracts (kspecanal.py:736-768, :400-411)."""
    import dataclasses
    from kspecanal_tpu.models.scan import scan_view, make_scan_plan
    save = str(tmp_path / "lvls.bin")
    cfg = scan_cfg(save_sig_lvls=save)
    src = SynthIQSource(sample_rate=cfg.sampling_rate, seed=31)
    sess = sess_mod.Session(cfg, src)
    state = sess_mod.run_scan(sess, max_sweeps=1)
    sess.save_baseline()

    cfg2 = scan_cfg(adj_sig_lvls=save)
    sess2 = sess_mod.Session(cfg2, SynthIQSource(
        sample_rate=cfg.sampling_rate, seed=31))
    assert sess2.adj is not None
    state2 = sess_mod.run_scan(sess2, max_sweeps=1)
    plan = sess_mod.make_plan_cached(cfg2)
    view = scan_view(state2, cfg2, plan, jnp.asarray(sess2.adj))
    # identical source + subtracted baseline -> avg curve ~ 0 everywhere
    assert float(np.max(np.abs(np.asarray(state2.fft_avg) - sess2.adj))) < 1e-3
    # range mismatch -> adjustment disabled
    cfg3 = scan_cfg(adj_sig_lvls=save, end_freq=98e6)
    sess3 = sess_mod.Session(cfg3, None)
    assert sess3.adj is None


def test_session_checkpoint_resume(tmp_path):
    """tpuStateFile round trip: a second session resumes the accumulated
    curves exactly; a mismatched config ignores the checkpoint."""
    import dataclasses
    path = str(tmp_path / "state.npz")
    cfg = SpecConfig(prg_mode="ZEROSPAN", center_freq=92e6, fft_size=512,
                     sampling_rate=2.4e6, cur_scan_non_overlap=0.5,
                     x_res=256, prg_loop_cnt=2).finalize()
    src = SynthIQSource(center_freq=cfg.center_freq,
                        sample_rate=cfg.sampling_rate, seed=5)
    sess = sess_mod.Session(cfg, src, state_file=path)
    st1 = sess_mod.run_zero_span(sess)
    sess2 = sess_mod.Session(cfg, src, state_file=path)
    st2 = sess2._resume_state(cfg, "zerospan")
    assert st2 is not None
    np.testing.assert_array_equal(np.asarray(st1.fft_max),
                                  np.asarray(st2.fft_max))
    np.testing.assert_array_equal(np.asarray(st1.heatmap),
                                  np.asarray(st2.heatmap))
    # mismatched fingerprint -> None (start fresh), like the baseline loader
    other = dataclasses.replace(cfg, fft_size=256).finalize()
    assert sess2._resume_state(other, "zerospan") is None
    # wrong MODE with an identical frequency fingerprint -> refused
    assert sess2._resume_state(cfg, "scan") is None
    # x_res is part of the fingerprint (heatmap ring width)
    narrower = dataclasses.replace(cfg, x_res=128).finalize()
    assert sess2._resume_state(narrower, "zerospan") is None


def test_scan_render_every_band_wins_over_catchup(rng):
    """tpuRenderEvery band + tpuCatchUp: the per-band cadence is the point
    of the option, so the session must take the serial sweep loop (with a
    WARN) instead of silently batching S sweeps per dispatch."""
    cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=92e6,
                     sampling_rate=2e6, fft_size=128, x_res=128,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5).finalize()
    plan = scan_mod.make_scan_plan(cfg)
    views = []
    src = SynthIQSource(sample_rate=cfg.sampling_rate, seed=29)
    sess = sess_mod.Session(
        cfg, src, renderer=lambda s, v, p, i, ts: views.append(v),
        render_every="band", catch_up=8)
    state = sess_mod.run_scan(sess, max_sweeps=2)
    assert len(views) == 2 * (plan.num_bands + 1)
    # identical result to the batched path on the same source stream
    src2 = SynthIQSource(sample_rate=cfg.sampling_rate, seed=29)
    sess2 = sess_mod.Session(cfg, src2)
    state2 = sess_mod.run_scan(sess2, max_sweeps=2)
    np.testing.assert_allclose(np.asarray(state.fft_avg),
                               np.asarray(state2.fft_avg),
                               rtol=2e-5, atol=2e-5)


def test_scan_catchup_u8_ship_matches_f32(tmp_path, rng):
    """Scan catch-up with a raw-capable file source ships u8 sweeps
    (acquire_sweep_raw + sweep_steps_u8_jit) and must equal the decoded
    f32 path on the same capture, with and without sweep prefetch."""
    from kspecanal_tpu.io.sources import FileIQSource
    cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=92e6,
                     sampling_rate=2e6, fft_size=128, x_res=128,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5).finalize()
    raw = rng.integers(0, 256, size=2 * 64 * cfg.full_size).astype(np.uint8)
    p = tmp_path / "cap.iq"
    p.write_bytes(raw.tobytes())

    class NoRaw:
        """FileIQSource facade without read_raw (forces the f32 path)."""
        def __init__(self, inner):
            self._inner = inner
        def read(self, n):
            return self._inner.read(n)
        def retune(self, *a):
            return self._inner.retune(*a)
        def close(self):
            self._inner.close()
        @property
        def exhausted(self):
            return self._inner.exhausted

    for prefetch in (False, True):
        src_u8 = FileIQSource(str(p), sample_rate=cfg.sampling_rate)
        sess_u8 = sess_mod.Session(cfg, src_u8, catch_up=4,
                                   sweep_prefetch=prefetch)
        st_u8 = sess_mod.run_scan(sess_u8, max_sweeps=4)
        src_f32 = NoRaw(FileIQSource(str(p), sample_rate=cfg.sampling_rate))
        sess_f32 = sess_mod.Session(cfg, src_f32, catch_up=4,
                                    sweep_prefetch=prefetch)
        st_f32 = sess_mod.run_scan(sess_f32, max_sweeps=4)
        for f in st_u8._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(st_u8, f)), np.asarray(getattr(st_f32, f)),
                rtol=1e-6, atol=1e-6, err_msg=f"{f} prefetch={prefetch}")


def test_scan_serial_u8_ship_matches_f32(tmp_path, rng):
    """The SERIAL sweep loop (no catch-up) also ships u8 from raw-capable
    sources — including with sweep prefetch and the per-band render
    cadence — and must equal the decoded-f32 driver exactly."""
    from kspecanal_tpu.io.sources import FileIQSource
    cfg = SpecConfig(prg_mode=MODE_SCAN, start_freq=88e6, end_freq=92e6,
                     sampling_rate=2e6, fft_size=128, x_res=128,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5).finalize()
    raw = rng.integers(0, 256, size=2 * 64 * cfg.full_size).astype(np.uint8)
    p = tmp_path / "cap.iq"
    p.write_bytes(raw.tobytes())

    class NoRaw:
        def __init__(self, inner):
            self._inner = inner
        def read(self, n):
            return self._inner.read(n)
        def retune(self, *a):
            return self._inner.retune(*a)
        def close(self):
            self._inner.close()
        @property
        def exhausted(self):
            return self._inner.exhausted

    for prefetch, cadence in ((False, "sweep"), (True, "sweep"),
                              (False, "band")):
        views = []
        renderer = ((lambda s, v, pk, i, ts: views.append(v))
                    if cadence == "band" else None)
        src = FileIQSource(str(p), sample_rate=cfg.sampling_rate)
        sess = sess_mod.Session(cfg, src, renderer=renderer,
                                sweep_prefetch=prefetch,
                                render_every=cadence)
        st_u8 = sess_mod.run_scan(sess, max_sweeps=3)
        src2 = NoRaw(FileIQSource(str(p), sample_rate=cfg.sampling_rate))
        sess2 = sess_mod.Session(cfg, src2, renderer=renderer,
                                 sweep_prefetch=prefetch,
                                 render_every=cadence)
        st_f32 = sess_mod.run_scan(sess2, max_sweeps=3)
        for f in st_u8._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(st_u8, f)), np.asarray(getattr(st_f32, f)),
                rtol=1e-6, atol=1e-6,
                err_msg=f"{f} prefetch={prefetch} cadence={cadence}")


class _GrowingSource:
    """Constant-amplitude tone source whose amplitude doubles every sweep
    (every ``bands_per_sweep`` reads) — makes max-curve growth observable."""

    def __init__(self, cfg, bands_per_sweep):
        self.center_freq = cfg.center_freq or 92e6
        self.sample_rate = cfg.sampling_rate
        self.gain = cfg.gain
        self._n = 0
        self._bands = bands_per_sweep

    def read(self, n):
        amp = 2.0 ** (self._n // self._bands)
        self._n += 1
        return (np.full(n, amp, np.float32), np.zeros(n, np.float32))

    def retune(self, fc, fs, gain):
        return True

    def close(self):
        pass


def _scan_toggle_renderer(toggle_after, **flips):
    """Renderer stub whose apply_toggles flips config flags after the
    ``toggle_after``-th rendered sweep (simulating a GUI button press)."""
    class R:
        def __init__(self):
            self.n = 0

        def __call__(self, sess, view, peaks, i, ts):
            self.n += 1

        def apply_toggles(self, cfg):
            import dataclasses
            if self.n >= toggle_after:
                return dataclasses.replace(cfg, **flips)
            return cfg
    return R()


def test_scan_toggle_stops_max_cumulation():
    """Mid-scan GUI toggles reach the ACCUMULATORS, not just the drawing:
    the reference's buttons mutate gD and _scan_range reads bDataMax per
    band (kspecanal.py:1010-1047 -> :651-662), so turning MaxLvls off
    mid-scan freezes the max curve while Avg keeps cumulating."""
    cfg = scan_cfg()
    plan = sess_mod.make_plan_cached(cfg)
    src = _GrowingSource(cfg, plan.num_bands)
    r = _scan_toggle_renderer(2, b_data_max=False)
    sess = sess_mod.Session(cfg, src, renderer=r)
    state = sess_mod.run_scan(sess, max_sweeps=4)
    assert sess.cfg.b_data_max is False
    frozen = np.asarray(state.fft_max)

    # Baseline: same stream with the toggle never applied -> max grows.
    src2 = _GrowingSource(cfg, plan.num_bands)
    sess2 = sess_mod.Session(cfg, src2, renderer=_scan_toggle_renderer(99))
    state2 = sess_mod.run_scan(sess2, max_sweeps=4)
    grown = np.asarray(state2.fft_max)
    assert np.max(grown) > np.max(frozen) + 1.0   # ~6 dB/sweep growth

    # The frozen max equals a run STOPPED at the toggle boundary...
    src3 = _GrowingSource(cfg, plan.num_bands)
    sess3 = sess_mod.Session(cfg, src3, renderer=_scan_toggle_renderer(99))
    state3 = sess_mod.run_scan(sess3, max_sweeps=2)
    np.testing.assert_array_equal(frozen, np.asarray(state3.fft_max))
    # ...while Avg kept cumulating after it.
    assert not np.array_equal(np.asarray(state.fft_avg),
                              np.asarray(state3.fft_avg))


def test_scan_catchup_toggle_applies_between_batches():
    """The batched scan driver folds toggles at batch boundaries too."""
    cfg = scan_cfg()
    plan = sess_mod.make_plan_cached(cfg)
    src = _GrowingSource(cfg, plan.num_bands)
    r = _scan_toggle_renderer(1, b_data_max=False)
    sess = sess_mod.Session(cfg, src, renderer=r, catch_up=2)
    state = sess_mod.run_scan(sess, max_sweeps=6)
    assert sess.cfg.b_data_max is False
    # Sweeps 3-6 ran with b_data_max off: max matches the 2-sweep run.
    src2 = _GrowingSource(cfg, plan.num_bands)
    sess2 = sess_mod.Session(cfg, src2, renderer=None, catch_up=2)
    state2 = sess_mod.run_scan(sess2, max_sweeps=2)
    np.testing.assert_array_equal(np.asarray(state.fft_max),
                                  np.asarray(state2.fft_max))


def test_replay_catchup_matches_serial(tmp_path):
    """zeroSpanPlay with tpuCatchUp batches K recorded frames per dispatch
    through the batched display fold — final state identical to the
    per-frame replay (and the K=1 path identical to the old serial
    display_update)."""
    rng = np.random.default_rng(77)
    save = str(tmp_path / "rec.pkl")
    cfg = zs_cfg(prg_mode="ZEROSPANSAVE", zero_span_save_file=save,
                 prg_loop_cnt=7)
    src = SynthIQSource(sample_rate=cfg.sampling_rate, seed=5)
    sess_mod.run_zero_span_save(sess_mod.Session(cfg, src), max_iters=7)

    def play(catch_up):
        pcfg = zs_cfg(prg_mode="ZEROSPANPLAY", zero_span_play_file=save)
        sess = sess_mod.Session(pcfg, None, catch_up=catch_up)
        return sess_mod.run_zero_span_play(sess)

    serial = play(0)
    batched = play(3)   # 7 frames -> batches of 3, 3, 1
    for a, b in zip(serial, batched):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_save_honors_catchup_and_raw_ship(tmp_path):
    """zeroSpanSave batches tpuCatchUp frames per dispatch and ships raw
    u8 for raw-capable sources — recorded stream identical to the
    fixed-chunk f32 path."""
    from kspecanal_tpu.io.replay import ZeroSpanPlayer
    from kspecanal_tpu.io.sources import FileIQSource
    rng = np.random.default_rng(78)
    cap = tmp_path / "cap.iq"
    cfg0 = zs_cfg()
    cap.write_bytes(rng.integers(0, 256, 2 * 6 * cfg0.full_size,
                                 dtype=np.uint8).tobytes())

    def record(catch_up, name):
        save = str(tmp_path / name)
        cfg = zs_cfg(prg_mode="ZEROSPANSAVE", zero_span_save_file=save)
        sess = sess_mod.Session(cfg, FileIQSource(str(cap)),
                                catch_up=catch_up)
        n = sess_mod.run_zero_span_save(sess, max_iters=5)
        assert n == 5
        with ZeroSpanPlayer(save) as p:
            return [np.asarray(f) for _, f in p.frames()]

    a = record(0, "a.pkl")     # historical chunk=8 path
    b = record(3, "b.pkl")     # tpuCatchUp chunking
    assert len(a) == len(b) == 5
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(fa, fb, rtol=1e-6, atol=1e-9)


def test_iteration_timing_prints_visible_by_default(tmp_path, caplog):
    """Per-iteration wall-time lines (ZeroSpan:{i}:{dt} kspecanal.py:462,
    ZeroSpanSave kspecanal.py:519-522) must be visible in a default
    headless run — they are the reference's primary observability
    signal.  tpuLogIter false silences them."""
    import logging

    from kspecanal_tpu.utils.logging import set_iter_logging

    cfg = zs_cfg()
    src = SynthIQSource(center_freq=cfg.center_freq,
                        sample_rate=cfg.sampling_rate, gain=0.5, seed=3)
    with caplog.at_level(logging.INFO, logger="kspecanal_tpu"):
        sess_mod.run_zero_span(sess_mod.Session(cfg, src), max_iters=2)
    assert any(m.startswith("ZeroSpan:0:") for m in caplog.messages)
    assert any(m.startswith("ZeroSpan:1:") for m in caplog.messages)

    caplog.clear()
    save_cfg = zs_cfg(prg_mode="ZEROSPANSAVE",
                      zero_span_save_file=str(tmp_path / "s.pkl"))
    with caplog.at_level(logging.INFO, logger="kspecanal_tpu"):
        sess_mod.run_zero_span_save(
            sess_mod.Session(save_cfg, SynthIQSource(
                center_freq=cfg.center_freq,
                sample_rate=cfg.sampling_rate, gain=0.5, seed=3)),
            max_iters=2)
    assert any(m.startswith("ZeroSpanSave:0:") for m in caplog.messages)

    # tpuLogIter false: silenced (parse wiring covered in test_cli).
    caplog.clear()
    set_iter_logging(False)
    try:
        with caplog.at_level(logging.INFO, logger="kspecanal_tpu"):
            sess_mod.run_zero_span(sess_mod.Session(cfg, SynthIQSource(
                center_freq=cfg.center_freq,
                sample_rate=cfg.sampling_rate, gain=0.5, seed=3)),
                max_iters=1)
        assert not any(m.startswith("ZeroSpan:") for m in caplog.messages)
    finally:
        set_iter_logging(True)
