"""The quarter-wave sin(2*pi*u) polynomial behind the in-kernel noise.

Round 5 replaced Mosaic's builtin cos/sin in the Box-Muller stage (they
lower ~17x slower than log/exp on the v5e and were ~85% of the headline
solve) with `kernels.pm_mppi._sin2pi`. The kernel-level statistics are
validated on hardware every bench run (`in_kernel_noise_check`); this
fast test pins the polynomial itself against numpy so a coefficient or
folding regression is caught off-TPU.
"""

import numpy as np
import jax.numpy as jnp

from mppi_tf_tpu.kernels.pm_mppi import _sin2pi


def test_sin2pi_accuracy_full_period_and_beyond():
    # the kernel feeds u in [0, 1) and u + 0.25 (cos identity); test a
    # wider range to cover the period fold
    u = np.linspace(-1.5, 2.5, 400001)
    got = np.asarray(_sin2pi(jnp.asarray(u, jnp.float32)), np.float64)
    want = np.sin(2.0 * np.pi * u)
    assert np.abs(got - want).max() < 1e-6


def test_sin2pi_cos_identity_and_landmarks():
    u = np.linspace(0.0, 1.0, 100001)
    cos_got = np.asarray(_sin2pi(jnp.asarray(u + 0.25, jnp.float32)),
                         np.float64)
    assert np.abs(cos_got - np.cos(2.0 * np.pi * u)).max() < 1e-6
    # exact-by-construction landmarks of the folding
    for uu, want in ((0.0, 0.0), (0.25, 1.0), (0.5, 0.0), (0.75, -1.0)):
        got = float(_sin2pi(jnp.float32(uu)))
        assert abs(got - want) < 2e-7, (uu, got)


def test_sin2pi_pythagorean_norm():
    """cos^2 + sin^2 ~ 1: the Box-Muller pair (r cos, r sin) preserves
    the chi-square radius up to polynomial error."""
    u = np.linspace(0.0, 1.0, 100001, dtype=np.float32)
    s = np.asarray(_sin2pi(jnp.asarray(u)), np.float64)
    c = np.asarray(_sin2pi(jnp.asarray(u + 0.25)), np.float64)
    assert np.abs(s * s + c * c - 1.0).max() < 3e-6
