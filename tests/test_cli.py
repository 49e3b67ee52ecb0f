"""CLI compatibility: every invocation in hkvc-run.new.examples must parse,
with the reference's token-pair, alias, and fixup semantics."""
import pytest

from kspecanal_tpu.cli import CliError, parse_args, print_info
from kspecanal_tpu.config import (COMPRESS_RAW, MODE_SCAN, MODE_ZEROSPAN,
                                  MODE_ZEROSPANPLAY, MODE_ZEROSPANSAVE,
                                  WINDOW_HANNING)


def test_examples_from_reference_parse():
    """The command matrix from hkvc-run.new.examples:1-15."""
    cases = [
        ["SCAN", "startFreq", "80e6", "endFreq", "120e6"],
        ["SCAN", "startFreq", "30000000", "endFreq", "200000000",
         "samplingRate", "2000000", "gain", "48.0", "window", "hanning"],
        ["ZEROSPAN", "centerFreq", "91000000", "samplingRate", "2e6",
         "gain", "19.1"],
        ["zeroSpan", "centerFreq", "30000000"],
        ["zeroSpanSave", "centerFreq", "881e6", "zeroSpanSaveFile",
         "/tmp/t.zerospansave", "samplingRate", "3.2e6"],
        ["zeroSpanPlay", "centerFreq", "881e6", "zeroSpanPlayFile",
         "/tmp/t.zerospansave"],
        ["zeroSpanPlay", "zeroSpanPlayFile", "/tmp/t.zerospansave"],
        ["zeroSpan", "centerFreq", "95e6", "saveSigLvls", "/tmp/sl.bin"],
        ["zeroSpan", "centerFreq", "95e6", "adjSigLvls", "/tmp/sl.bin"],
        ["scan", "startFreq", "800e6", "endFreq", "1e9", "saveSigLvls",
         "/tmp/sl.bin"],
    ]
    for argv in cases:
        cfg, run = parse_args(argv)
        assert cfg.prg_mode in (MODE_SCAN, MODE_ZEROSPAN, MODE_ZEROSPANSAVE,
                                MODE_ZEROSPANPLAY)


def test_scan_tokens():
    cfg, _ = parse_args(["SCAN", "startFreq", "30000000", "endFreq",
                         "200000000", "samplingRate", "2000000", "gain",
                         "48.0", "window", "hanning"])
    assert cfg.prg_mode == MODE_SCAN
    assert cfg.start_freq == 30e6
    assert cfg.end_freq == 200e6  # 170e6/2e6 = 85 groups, already integral
    assert cfg.sampling_rate == 2e6
    assert cfg.gain == 48.0
    assert cfg.window == WINDOW_HANNING
    assert cfg.center_freq == 115e6


def test_zero_span_derives_band_edges():
    cfg, _ = parse_args(["ZEROSPAN", "centerFreq", "91000000",
                         "samplingRate", "2e6"])
    assert cfg.start_freq == 90e6
    assert cfg.end_freq == 92e6


def test_quickfullscan_alias():
    """kspecanal.py:916-921."""
    cfg, _ = parse_args(["quickFullScan"])
    assert cfg.prg_mode == MODE_SCAN
    assert cfg.start_freq == 30e6
    assert cfg.end_freq >= 1.5e9
    assert cfg.fft_size == 64
    assert cfg.plt_compress == COMPRESS_RAW
    assert cfg.x_res == 64  # clamped to fftSize


def test_fmscan_is_default_mode():
    cfg, _ = parse_args([])
    assert cfg.prg_mode == MODE_SCAN
    assert cfg.start_freq == 88e6


def test_xres_fixup_to_divisor():
    """fftSize 8192 with xRes 500 -> forced to a divisor >= ~300
    (kspecanal.py:937-949: smallest divisor of fftSize >= fftSize/~(fftSize//300))."""
    cfg, _ = parse_args(["zeroSpan", "fftSize", "8192", "xRes", "500"])
    assert cfg.fft_size % cfg.x_res == 0
    # loop scans i = 27..1 for the first divisor of 8192 (i=16) -> 512
    assert cfg.x_res == 512


def test_boolean_parsing():
    cfg, _ = parse_args(["zeroSpan", "bDataMin", "false", "bDataMax", "TRUE",
                         "bPltHeatMap", "anything"])
    assert cfg.b_data_min is False
    assert cfg.b_data_max is True
    assert cfg.b_plt_heatmap is False  # only 'TRUE' is true (:771-775)


def test_unknown_arg_raises():
    with pytest.raises(CliError):
        parse_args(["zeroSpan", "notAnOption", "1"])


def test_tpu_run_options():
    cfg, run = parse_args(["zeroSpan", "tpuSource", "file:/tmp/x.iq",
                           "tpuHeadless", "true", "tpuMeshTime", "4"])
    assert run.source == "file:/tmp/x.iq"
    assert run.headless is True
    assert run.mesh_time == 4
    assert run.log_iter is True  # default matches the reference's prints
    _, run2 = parse_args(["zeroSpan", "tpuLogIter", "false"])
    assert run2.log_iter is False


def test_print_info_runs(capsys):
    cfg, _ = parse_args(["zeroSpan"])
    print_info(cfg)  # must not raise


def test_reference_key_parity():
    """Every CLI key the reference's handle_args accepts (the == 'KEY'
    comparisons at kspecanal.py:813-911) must parse here too."""
    from kspecanal_tpu.cli import _KEYMAP
    reference_keys = {
        "ADJSIGLVLS", "BDATAAVG", "BDATACUR", "BDATAMAX", "BDATAMIN",
        "BGRID", "BPLTHEATMAP", "BPLTLEVELS", "BSCANRANGEBASEDATAISRAW",
        "BUSEPSD", "CENTERFREQ", "CURSCANCUMUMODE", "CURSCANNONOVERLAP",
        "ENDFREQ", "FFTSIZE", "GAIN", "MINAMP4CLIP", "PLTCOMPRESS",
        "PLTHIGHSDELTA4MARKING", "PLTHIGHSNUMMARKERS", "PLTHIGHSPAUSE",
        "PRGLOOPCNT", "SAMPLINGRATE", "SAVESIGLVLS", "SCANRANGENONOVERLAP",
        "STARTFREQ", "WINDOW", "XRES", "ZEROSPANPLAYFILE",
        "ZEROSPANSAVEFILE",
    }
    assert reference_keys <= set(_KEYMAP)


def test_tpu_precision_option():
    cfg, _ = parse_args(["zeroSpan", "tpuPrecision", "high"])
    assert cfg.tpu_precision == "HIGH"
    from kspecanal_tpu.ops.mxu_fft import matmul_precision
    import jax
    assert matmul_precision("high") == jax.lax.Precision.HIGH
    assert matmul_precision("DEFAULT") == jax.lax.Precision.DEFAULT
    with pytest.raises(ValueError):
        matmul_precision("bogus")


def test_replay_error_paths(tmp_path):
    """Missing / corrupt replay files exit 1 with a clean message instead
    of a traceback; truncated streams end gracefully at EOF."""
    from kspecanal_tpu.cli import main
    missing = str(tmp_path / "nope.save")
    assert main(["zeroSpanPlay", "zeroSpanPlayFile", missing,
                 "tpuRenderer", "none"]) == 1
    garbage = tmp_path / "garbage.save"
    garbage.write_bytes(b"\x00\x01notapickle" * 4)
    assert main(["zeroSpanPlay", "zeroSpanPlayFile", str(garbage),
                 "tpuRenderer", "none"]) == 1


def test_edge_skip_bins_range_validated():
    """tpuEdgeSkipBins >= fftSize/2 would leave no inner bins (empty
    reduction crash deep inside jit) — must be rejected at parse time."""
    with pytest.raises(ValueError, match="tpuEdgeSkipBins"):
        parse_args(["zeroSpan", "fftSize", "256", "tpuEdgeSkipBins", "128"])
    cfg, _ = parse_args(["zeroSpan", "fftSize", "256",
                         "tpuEdgeSkipBins", "127"])
    assert cfg.tpu_edge_skip_bins == 127
