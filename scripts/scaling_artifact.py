"""Emit SCALING_r4.json: the machine-checkable stand-in for the >=80%
multi-chip scaling-efficiency claim (BASELINE.md) on this single-chip
environment (VERDICT r3 item 7).

Two measured legs, both on the 8-virtual-device CPU mesh (the only
multi-device substrate available here — see docs/SCALING.md for why real
ICI efficiency cannot be measured on one chip):

  1. virtual-mesh shard sweep (scripts/scaling_bench.py): total samples/s
     of the time-sharded streaming waterfall at 1/2/4/8 shards.  Virtual
     devices share the same physical cores, so the meaningful signal is
     total throughput staying FLAT (collective/halo overhead ~0), not
     linear growth.
  2. 2-process jax.distributed run (tests/mp_worker.py over Gloo) vs the
     identical single-process program: the cross-process collective
     overhead ratio.  Loopback-Gloo socket latency bounds this leg (~ms
     per collective vs us in-process); on real ICI the same collectives
     are us-scale (docs/SCALING.md byte table).

Usage: python scripts/scaling_artifact.py [out.json]
Modes (internal, run in subprocesses with their own device env):
  --ref1proc <out.npz>   single-process 8-device reference rate
"""
import json
import os
import socket
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env_8dev():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def _ref1proc(out_path: str) -> None:
    """Single-process 8-device rate of the mp_worker time-sharded step
    (same program/sizes as tests/mp_worker.py)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/kspec_jax_cache")
    import time

    import jax.numpy as jnp
    import numpy as np
    from kspecanal_tpu.config import SpecConfig, WINDOW_HANNING
    from kspecanal_tpu.parallel.mesh import make_mesh
    from kspecanal_tpu.parallel.timeshard import curscan_time_sharded

    mesh = make_mesh(time=8, band=1)
    cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=256, sampling_rate=2.4e6,
                     window=WINDOW_HANNING, cur_scan_non_overlap=0.5,
                     x_res=256).finalize()
    rng = np.random.default_rng(20260820)
    re = jnp.asarray(rng.standard_normal(cfg.full_size).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(cfg.full_size).astype(np.float32))
    spec = curscan_time_sharded(re, im, cfg, mesh)
    spec.block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        spec = curscan_time_sharded(re, im, cfg, mesh)
    spec.block_until_ready()
    rate = iters * cfg.full_size / (time.perf_counter() - t0)
    np.savez(out_path, rate=np.float64(rate))


def main(out_json: str) -> int:
    import numpy as np
    tmp = tempfile.mkdtemp(prefix="scaling_r4_")

    # --- leg 1: virtual-mesh shard sweep ------------------------------
    vjson = os.path.join(tmp, "vmesh.json")
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "scaling_bench.py"),
         "2048", "64", f"--json={vjson}"],
        env=_env_8dev(), capture_output=True, text=True, timeout=1200)
    if r.returncode != 0:
        print(r.stdout + r.stderr, file=sys.stderr)
        return 1
    with open(vjson) as f:
        vmesh = json.load(f)
    print(r.stdout, flush=True)

    # --- leg 2: 2-process Gloo vs 1-process ---------------------------
    ref_npz = os.path.join(tmp, "ref.npz")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--ref1proc", ref_npz],
        env=_env_8dev(), capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        print(r.stdout + r.stderr, file=sys.stderr)
        return 1
    with np.load(ref_npz) as z:
        rate_1proc = float(z["rate"])

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # worker sets its own 4-device flag
    worker = os.path.join(_REPO, "tests", "mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), tmp], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            if p.returncode != 0:
                print(out[-2000:], file=sys.stderr)
                return 1
    finally:
        # A failed/deadlocked worker must not orphan its sibling (it
        # would keep holding the coordinator port across reruns).
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    rates_2proc = []
    for pid in (0, 1):
        with np.load(os.path.join(tmp, f"result_{pid}.npz")) as z:
            rates_2proc.append(float(z["rate"]))

    artifact = {
        "round": 4,
        "substrate": "8 virtual CPU devices (single-chip environment; "
                     "real ICI scaling unmeasurable here — see "
                     "docs/SCALING.md)",
        "virtual_mesh_sweep": vmesh,
        "two_process_gloo": {
            "rate_1proc_samples_per_s": rate_1proc,
            "rate_2proc_samples_per_s": rates_2proc,
            "ratio_2proc_over_1proc": min(rates_2proc) / rate_1proc,
            "note": "loopback-Gloo socket latency dominates at this smoke "
                    "size (~ms/collective vs us in-process); bit-identical "
                    "outputs are asserted in tests/test_multiprocess.py",
        },
        "claim": "total virtual-mesh throughput stays flat as shards are "
                 "added (collective/halo overhead ~0) and the 2-process "
                 "run is deadlock-free with identical math; the >=80% ICI "
                 "target remains unmeasured pending multi-chip hardware",
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_json}", flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--ref1proc":
        _ref1proc(sys.argv[2])
        sys.exit(0)
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r4.json")
    sys.exit(main(out))
