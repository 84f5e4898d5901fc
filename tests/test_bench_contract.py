"""Driver-contract guard: bench.py emits one valid JSON line on CPU."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(**extra_env):
    env = {**os.environ, "BENCH_K": "256", "BENCH_TAU": "5",
           "BENCH_CHAIN": "2", "JAX_PLATFORMS": "cpu",
           "BENCH_KERNEL": "xla", **extra_env}
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=400,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    rec = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["unit"] == "ms"
    assert rec["value"] > 0
    assert rec["extra"]["kernel"] == "xla"
    return rec


def test_bench_json_contract():
    rec = _run_bench()
    assert "point_mass3d" in rec["metric"]


def test_bench_auv_workload():
    rec = _run_bench(BENCH_WORKLOAD="auv", BENCH_K="128", BENCH_TAU="4")
    assert "auv_rexrov2" in rec["metric"]
    assert rec["extra"]["workload"] == "auv"


def test_bench_sharded_mode():
    rec = _run_bench(BENCH_SHARDED="1",
                     XLA_FLAGS="--xla_force_host_platform_device_count=8")
    assert rec["extra"]["sharded"] is True
    assert rec["extra"]["n_devices"] == 8
