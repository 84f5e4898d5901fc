"""Driver-contract guard: bench.py emits one valid JSON line on CPU."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(os.environ, BENCH_K="256", BENCH_TAU="5", BENCH_CHAIN="2",
               JAX_PLATFORMS="cpu", BENCH_KERNEL="xla")
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
