"""Driver-contract checks: entry() compiles and runs; dryrun_multichip
executes the full sharded pipeline on the virtual mesh; session drivers
honor a time-sharded mesh."""
import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.rows.shape[0] == args[0].shape[0]


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_zero_span_session_with_time_mesh(rng):
    from kspecanal_tpu.config import SpecConfig
    from kspecanal_tpu.io.sources import SynthIQSource
    from kspecanal_tpu.parallel.mesh import make_mesh
    from kspecanal_tpu import session as sess_mod

    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=128, sampling_rate=2.4e6,
                     cur_scan_non_overlap=0.5, x_res=128).finalize()
    mesh = make_mesh(time=4)
    src = SynthIQSource(center_freq=cfg.center_freq,
                        sample_rate=cfg.sampling_rate, seed=21)
    sess = sess_mod.Session(cfg, src, mesh=mesh)
    state = sess_mod.run_zero_span(sess, max_iters=3)
    # equal to the unsharded driver
    src2 = SynthIQSource(center_freq=cfg.center_freq,
                         sample_rate=cfg.sampling_rate, seed=21)
    sess2 = sess_mod.Session(cfg, src2)
    state2 = sess_mod.run_zero_span(sess2, max_iters=3)
    np.testing.assert_allclose(np.asarray(state.fft_avg),
                               np.asarray(state2.fft_avg),
                               rtol=1e-5, atol=1e-5)
