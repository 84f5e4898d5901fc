"""Local multi-process cluster harness: spawn N worker processes that join
one jax.distributed runtime (gloo CPU collectives) and run the mesh-sharded
solves — the executed proof + timing surface for parallel/launch.py.

Production consumers: __graft_entry__.dryrun_multichip (the driver's
multi-chip artifact) and bench.py's "N>=2 hosts" reporting row
(BASELINE.md); tests/test_multiprocess.py asserts the parity properties.
Lives in the package (not tests/) so those entry points need no sys.path
surgery and no pytest import.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

_PARALLEL_DIR = os.path.dirname(os.path.abspath(__file__))
# Workers run the INSTALLED package (`python -m mppi_tf_tpu.parallel.
# _mp_worker`); prepending the parent of the package this process actually
# imported keeps checkout runs (no pip install) working and is a no-op for
# a site-packages install, which is already importable.
_PKG_PARENT = os.path.dirname(os.path.dirname(_PARALLEL_DIR))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_cluster(nproc: int = 2, devices_per_proc: int = 4,
                timeout: int = 420, out_dir: str | None = None,
                bench: str = ""):
    """Spawn ``nproc`` worker processes (each with ``devices_per_proc``
    virtual CPU devices, joined via a localhost coordinator); returns their
    parsed result dicts.

    ``bench='K,TAU,CHAIN'`` additionally times a chained sharded solve per
    worker (reported as ``p50_solve_ms``). ``out_dir`` defaults to a fresh
    temporary directory so concurrent clusters (pytest + bench, parallel
    CI) never race on result files.
    """
    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": f"--xla_force_host_platform_device_count="
                        f"{devices_per_proc}",
           "PYTHONPATH": _PKG_PARENT + os.pathsep
                         + os.environ.get("PYTHONPATH", "")}
    # a worker must not inherit the parent's compilation-cache lock dir
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    auto_dir = out_dir is None
    if auto_dir:
        out_dir = tempfile.mkdtemp(prefix="mppi_mp_cluster_")
    outs = [os.path.join(out_dir, f"mp_worker_{i}.json")
            for i in range(nproc)]
    procs = []
    for i in range(nproc):
        if os.path.exists(outs[i]):
            os.remove(outs[i])
        cmd = [sys.executable, "-m", "mppi_tf_tpu.parallel._mp_worker",
               "--coord", f"127.0.0.1:{port}",
               "--nproc", str(nproc), "--pid", str(i), "--out", outs[i]]
        if bench:
            cmd += ["--bench", bench]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    results, logs = [], []
    try:
        for i, p in enumerate(procs):
            stdout, _ = p.communicate(timeout=timeout)
            logs.append(f"--- worker {i} (rc={p.returncode}) ---\n{stdout}")
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker {i} failed:\n" + "\n".join(logs))
            with open(outs[i]) as f:
                results.append(json.load(f))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        if auto_dir:  # results are parsed above; don't leak the tmpdir
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
    return results
