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
    # never contend for the machine-wide TPU client lock from a test
    # (a live watcher can hold it for a 20-minute refresh)
    env["PRTP_TPU_LOCK"] = "/tmp/prtp_tpu_test.lock"
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


def test_tpu_lock_is_env_reentrant_and_cpu_skipped(monkeypatch, tmp_path):
    """bench.py serializes TPU clients on a machine-wide flock (two
    concurrent clients crash the tunnel's worker). The lock must be
    env-marked reentrant (a watcher holding the flock spawns bench
    children — a blind re-acquire would deadlock) and skipped entirely
    for CPU-forced runs."""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setenv("PRTP_TPU_LOCK", str(tmp_path / "lock"))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("PRTP_TPU_LOCK_HELD", raising=False)
    f = bench._acquire_tpu_lock()
    try:
        assert f is not None
        assert os.environ["PRTP_TPU_LOCK_HELD"] == "1"
        # the held marker short-circuits nested acquires (no deadlock)
        assert bench._acquire_tpu_lock() is None
    finally:
        f.close()
    monkeypatch.delenv("PRTP_TPU_LOCK_HELD")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._acquire_tpu_lock() is None


def test_integrity_gate_rejects_impossible_and_unstable_points():
    """VERDICT r4 gate: bench.py must REFUSE to emit a point whose
    derived MFU exceeds 1.0 or whose inter-trial spread exceeds 15% —
    r4 committed merged-point artifacts at MFU 235-348% because an
    aborted dispatch was timed as a success."""
    sys.path.insert(0, REPO)
    import bench

    # physically impossible: 100 steps/s at 10 TFLOP/step on a
    # 197 TFLOP/s chip would be MFU ~5
    val, reason = bench.gate_point([100.0, 100.0, 100.0], trials=3,
                                   flops_per_step=1e13, peak_tflops=197.0)
    assert val is None and "MFU" in reason

    # unstable clock: 3.5x spread across trials (r4's merged artifacts)
    val, reason = bench.gate_point([35.0, 120.0, 100.0], trials=3)
    assert val is None and "spread" in reason

    # sane point passes and reports the best trial
    val, reason = bench.gate_point([10.0, 9.8, 10.1], trials=3,
                                   flops_per_step=1e9, peak_tflops=197.0)
    assert reason is None and val == 10.1

    # extra-trials window: one cold outlier followed by a stable window
    # is accepted on the LAST `trials` samples
    val, reason = bench.gate_point([2.0, 10.0, 9.9, 10.1], trials=3)
    assert reason is None and val == 10.1


def test_gate_peak_is_dtype_correct(monkeypatch):
    """The impossibility gate must use the roofline of the dtype the
    point actually ran: f32 matmuls top out at ~1/2 the bf16 MXU rate,
    so gating an f32 point against the bf16 peak would let a 2x-broken
    clock through."""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setenv("BENCH_DTYPE", "float32")
    assert bench._gate_peak(197.0) == 197.0 / 2
    monkeypatch.setenv("BENCH_DTYPE", "bfloat16")
    assert bench._gate_peak(197.0) == 197.0
    monkeypatch.delenv("BENCH_DTYPE")
    assert bench._gate_peak(197.0) == 197.0 / 2  # default dtype is f32
    assert bench._gate_peak(None) is None

    # an f32 measurement that is possible vs the bf16 peak but
    # impossible vs the f32 roofline must be rejected
    monkeypatch.setenv("BENCH_DTYPE", "float32")
    peak = bench._gate_peak(197.0)
    val, reason = bench.gate_point([15.0, 15.0, 15.0], trials=3,
                                   flops_per_step=1e13, peak_tflops=peak)
    assert val is None and "MFU" in reason


def test_timed_trials_raises_on_nonfinite_loss():
    """An aborted/NaN dispatch must raise, never return a timing."""
    import numpy as np
    import pytest

    sys.path.insert(0, REPO)
    import bench

    def bad_step(state, design, ids, mask):
        return state, {"loss": np.float32("nan")}

    with pytest.raises(RuntimeError, match="non-finite"):
        bench.timed_trials(bad_step, None, None, None, None, inner=1,
                           trials=2, label="fake")
