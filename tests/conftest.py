"""Test harness configuration.

- Runs on CPU with 8 virtual XLA devices so multi-chip sharding
  (shard_map over a Mesh) is exercised without TPU hardware.
- Enables f64 so closed-form parity tests match hand-computed numpy
  expectations at tight tolerances (the reference suite is float64
  throughout, scripts/test.py).
"""

import os
import sys

# Cross-test helpers import as `from tests.test_auv_kernel import ...`:
# make the repo root importable regardless of the invoking cwd (an
# installed package run from anywhere must still resolve the test pkg).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Force CPU: the session environment pins JAX to the TPU tunnel ("axon"),
# which is slow for unit tests and lacks f64 support. The axon sitecustomize
# calls jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# overriding the env var — so the config must be re-updated after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
