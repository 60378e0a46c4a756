"""bench.py end-to-end smoke at tiny sizes on CPU.

bench.py is the driver-visible artifact (one JSON line per round); a
regression here nulls the round's recorded benchmark, so the whole
orchestration — subprocess point isolation, fallback chains, JSON
assembly — is exercised as the driver runs it: a clean subprocess, no
conftest jax config (the child forces CPU via env alone).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "BENCH_NODES": "1500", "BENCH_LEVELS": "6", "BENCH_BATCH": "32",
    "BENCH_MAP": "16", "BENCH_CNN_HW": "64", "BENCH_OUT_DIM": "16",
    "BENCH_HIDDEN": "32", "BENCH_TPU_STEPS": "2", "BENCH_CPU_STEPS": "1",
    "BENCH_BIG_NODES": "2000", "BENCH_BIG_LEVELS": "8",
    "BENCH_MERGED_K": "2", "BENCH_MERGED_NODES": "600",
    "BENCH_MERGED_LEVELS": "6", "BENCH_SCAN_GROUPS": "2",
    "BENCH_TIME_BUDGET": "900",
}


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if "sitecustomize" not in v}
    env.update(TINY)
    env["JAX_PLATFORMS"] = "cpu"
    # drop the TPU-plugin site dir so the env var alone wins in children
    env["PYTHONPATH"] = REPO
    return env


def test_bench_main_prints_one_json_line():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=_clean_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=1500, cwd=REPO)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    lines = proc.stdout.decode().strip().splitlines()
    assert len(lines) == 1, f"stdout must be ONE JSON line, got {lines}"
    result = json.loads(lines[0])
    assert result["metric"] == "train_steps_per_sec"
    assert result["value"] and result["value"] > 0
    d = result["detail"]
    # every bench point landed (CPU backend cannot fault like the tunnel)
    assert d["packing"] in ("exact", "grouped")
    assert d["big_design"]["steps_per_sec"] > 0
    assert d["big_design"]["packing"] in ("exact", "grouped", "scan")
    assert d["merged"]["steps_per_sec"] > 0
    assert d["baseline_steps_per_sec"] > 0
    # roofline accounting fields present (MFU honesty)
    for key in ("flops_per_step", "hbm_bytes_per_step", "achieved_tflops",
                "chip", "peak_tflops_bf16", "mfu"):
        assert key in d
    # bf16 is the headline default (r4); the f32 A/B lands in detail
    # when the budget allows (bench.py runs it only with >420s left, and
    # a slow host may legitimately skip it — null, not a failure)
    assert d["compute_dtype"] == "bfloat16"
    f32 = d["headline_f32_steps_per_sec"]
    assert f32 is None or f32 > 0
    assert d["tunnel_probe"]["ok"] is True
    assert d["tunnel_probe"]["attempts"] >= 1


def test_bench_probe_gate_nulls_round_without_burning_points():
    """A dead device must fail the round at the cheap probe, never at a
    point-timeout (round-3 failure mode: probe said dead at 08:28, then
    900+450+300 s of headline timeouts burned anyway)."""
    env = _clean_env()
    env["JAX_PLATFORMS"] = "tpu"  # no TPU here: every child fails fast
    env["BENCH_TIME_BUDGET"] = "60"  # too small for a probe retry sleep
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=300, cwd=REPO)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    result = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert result["value"] is None
    assert "probe-gated" in result["detail"]["error"]
    assert result["detail"]["tunnel_probe"]["ok"] is False
    assert result["detail"]["tunnel_probe"]["attempts"] >= 1
    # the gate held: no expensive point was ever attempted
    assert b"--- headline point" not in proc.stderr
