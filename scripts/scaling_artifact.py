"""Emit SCALING_r5.json: the machine-checkable stand-in for the >=80%
multi-chip scaling-efficiency claim (BASELINE.md) on this single-chip
environment (VERDICT r4 item 5).

Three measured legs, all on the 8-virtual-device CPU mesh (the only
multi-device substrate available here — see docs/SCALING.md for why real
ICI efficiency cannot be measured on one chip):

  1. weak-scaling sweep (fixed work PER SHARD): per-shard rate vs the
     1-shard rate.  Virtual shards share the same physical cores, so
     per-shard rate falls as ~1/s by construction; the rows record that
     honestly rather than claiming flatness.
  2. fixed-total-work sweep: constant work on constant physical
     capacity, so rate(s)/rate(1) isolates the PARTITIONING OVERHEAD
     (halo exchange, psums, lost fusion) — the one scaling quantity
     this environment can measure meaningfully.
  3. 2-process jax.distributed run (tests/mp_worker.py over Gloo) vs the
     identical single-process program: the cross-process collective
     overhead ratio.  Loopback-Gloo socket latency bounds this leg (~ms
     per collective vs us in-process); on real ICI the same collectives
     are us-scale.

Plus the static per-step collective-bytes table
(scripts/collective_bytes.py), and a claim COMPUTED from the measured
rows so the artifact cannot contradict itself.

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
sys.path.insert(0, os.path.join(_REPO, "scripts"))


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
    tmp = tempfile.mkdtemp(prefix="scaling_r5_")

    # --- legs 1+2: virtual-mesh shard sweeps --------------------------
    sweeps = {}
    for mode in ("weak", "fixedwork"):
        vjson = os.path.join(tmp, f"vmesh_{mode}.json")
        r = subprocess.run(
            [sys.executable,
             os.path.join(_REPO, "scripts", "scaling_bench.py"),
             "2048", "64", f"--mode={mode}", f"--json={vjson}"],
            env=_env_8dev(), capture_output=True, text=True, timeout=1200)
        if r.returncode != 0:
            print(r.stdout + r.stderr, file=sys.stderr)
            return 1
        with open(vjson) as f:
            sweeps[mode] = json.load(f)
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

    # Static collective-bytes table (computable without hardware).
    from collective_bytes import rows as cb_rows
    cbytes = [{"config": r[0], "sp_halo_per_step": r[1],
               "dp_psum_per_step": r[2], "tp_psum_per_step": r[3],
               "ep_all_gather_per_sweep": r[4]} for r in cb_rows(8)]

    # Claim text COMPUTED from the measured rows (an artifact whose
    # prose contradicts its numbers is worse than no artifact —
    # VERDICT r4 weak #4).
    weak_rows = sweeps["weak"]["rows"]
    fw_rows = sweeps["fixedwork"]["rows"]
    weak_last = weak_rows[-1]
    fw_worst = min(r["vs_1shard"] for r in fw_rows)
    fw_best = max(r["vs_1shard"] for r in fw_rows)
    claim = (
        f"On the shared-core virtual mesh, weak-scaling per-shard rate "
        f"falls to {weak_last['per_shard_vs_1shard']:.0%} of the 1-shard "
        f"rate at {weak_last['shards']} shards — expected ~1/s here, "
        f"since virtual shards add no compute capacity; this leg is "
        f"plumbing validation, not an efficiency measurement. With "
        f"total work held fixed, throughput across 1-"
        f"{fw_rows[-1]['shards']} shards stays between {fw_worst:.0%} "
        f"and {fw_best:.0%} of the unsharded rate (values above 100% "
        f"reflect better host-core utilization under sharding) — so "
        f"the partitioning overhead (halo + psums + lost fusion) costs "
        f"at most {max(0.0, 1 - fw_worst):.0%} here, the one scaling "
        f"quantity this environment can isolate. The 2-process Gloo run is deadlock-free with "
        f"bit-identical math (tests/test_multiprocess.py); its "
        f"{min(rates_2proc) / rate_1proc:.0%} rate ratio measures "
        f"loopback-socket collective latency, not ICI. The >=80% "
        f"multi-chip ICI target remains unmeasured pending multi-chip "
        f"hardware."
    )

    artifact = {
        "round": 5,
        "substrate": "8 virtual CPU devices (single-chip environment; "
                     "real ICI scaling unmeasurable here — see "
                     "docs/SCALING.md)",
        "weak_scaling_fixed_work_per_shard": sweeps["weak"],
        "fixed_total_work_overhead": sweeps["fixedwork"],
        "two_process_gloo": {
            "rate_1proc_samples_per_s": rate_1proc,
            "rate_2proc_samples_per_s": rates_2proc,
            "ratio_2proc_over_1proc": min(rates_2proc) / rate_1proc,
            "note": "loopback-Gloo socket latency dominates at this smoke "
                    "size (~ms/collective vs us in-process); bit-identical "
                    "outputs are asserted in tests/test_multiprocess.py",
        },
        "collective_bytes_per_step": cbytes,
        "claim": claim,
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
        _REPO, "SCALING_r5.json")
    sys.exit(main(out))
