"""Session-loop stage ablation (round 4): where does one catch-up batch
spend its time, and what binds the CLI loop once acquisition overlaps
device compute?

Stages measured at the bench session geometry (fft2048 kaiser 50%,
catch_up=16384 blocks = 67.1 Msamp/batch, renderer off):

  synth-only    DeviceSynthIQSource.read_device_batch (tone bank:
                ~6 transcendentals/sample)
  noise-only    DeviceNoiseIQSource.read_device_batch (bit-cheap)
  dsp-only      zs.zero_span_steps_jit on pre-staged planes (no view)
  loop(synth)   full run_zero_span, devicesynth
  loop(noise)   full run_zero_span, devicenoise

Run on the real TPU: `python scripts/session_ablate.py [precision]`.
Committed output lives in docs/DESIGN.md §"session path".
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kspec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(precision: str = "HIGHEST"):
    import jax.numpy as jnp
    from kspecanal_tpu import session as sess_mod
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER
    from kspecanal_tpu.io.sources import (DeviceNoiseIQSource,
                                          DeviceSynthIQSource)
    from kspecanal_tpu.models import zerospan as zs

    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=2048, sampling_rate=2.4e6,
                     window=WINDOW_KAISER, cur_scan_non_overlap=0.5,
                     x_res=512, tpu_precision=precision).finalize()
    k, n = 16384, cfg.full_size
    print(f"backend={jax.default_backend()} precision={precision} "
          f"batch={k} blocks x {n} samp = {k * n / 1e6:.1f} Msamp",
          flush=True)

    def timed(label, fn, warm=1, iters=4, samples=k * n):
        for _ in range(warm):
            out = fn()
        _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out)
                  .ravel()[0])
        best = None
        for _ in range(2):           # best-of-2 vs tunnel outliers
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out)
                      .ravel()[0])
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        print(f"{label:16s} {best * 1e3:8.2f} ms   "
              f"{samples / best / 1e9:6.2f} Gsamp/s", flush=True)
        return best

    synth = DeviceSynthIQSource(seed=0)
    noise = DeviceNoiseIQSource(seed=0)
    timed("synth-only", lambda: synth.read_device_batch(k, n))
    timed("noise-only", lambda: noise.read_device_batch(k, n))

    planes = noise.read_device_batch(k, n)
    state = zs.init_state(cfg)
    timed("dsp-only", lambda: zs.zero_span_steps_jit(
        state, planes[0], planes[1], cfg, False)[0].fft_avg)

    def loop(src_kind, batches=4):
        if src_kind == "synth":
            src = DeviceSynthIQSource(seed=0)
        elif src_kind == "noise":
            src = DeviceNoiseIQSource(seed=0)
        else:   # noise-reuse: one staged buffer, kernel-bench methodology
            src = DeviceNoiseIQSource(seed=0, reuse=True)
        sess = sess_mod.Session(cfg, src, renderer=None, catch_up=k)
        st = sess_mod.run_zero_span(sess, max_iters=batches * k)
        return st.fft_avg

    # 4 batches per call amortize per-run setup like the bench does;
    # rates print per-batch for comparison with the stage rows.
    for kind in ("synth", "noise", "noise-reuse"):
        timed(f"loop({kind})", lambda kk=kind: loop(kk), warm=1, iters=1,
              samples=4 * k * n)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "HIGHEST")
