"""Point-mass model tests against analytic LTI expectations.

Mirrors the reference TestPointMassModel strategy (scripts/test.py:43-236):
varying state/action dims and batch k, plus a gradient-descent convergence
test of the trainable mass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.models.point_mass import PointMassModel


def analytic_step(x, u, dt, mass):
    """Hand-built numpy double-integrator step, interleaved [q, v] layout."""
    sdim = x.shape[-1]
    adim = u.shape[-1]
    A = np.zeros((sdim, sdim))
    B = np.zeros((sdim, adim))
    for i in range(sdim // 2):
        A[2 * i, 2 * i] = 1.0
        A[2 * i, 2 * i + 1] = dt
        A[2 * i + 1, 2 * i + 1] = 1.0
    for j in range(adim):
        B[2 * j, j] = dt * dt / 2.0
        B[2 * j + 1, j] = dt
    return x @ A.T + (u @ B.T) / mass


@pytest.mark.parametrize("sdim,adim,k", [(2, 1, 1), (4, 2, 3), (6, 3, 5)])
def test_step_matches_analytic(sdim, adim, k):
    dt, mass = 0.1, 1.5
    model = PointMassModel(mass=mass, dt=dt, state_dim=sdim, action_dim=adim,
                           dtype=jnp.float64)
    params = model.init_params()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(k, sdim))
    u = rng.normal(size=(k, adim))
    got = model.step(params, jnp.asarray(x), jnp.asarray(u))
    np.testing.assert_allclose(got, analytic_step(x, u, dt, mass), rtol=1e-12)


def test_predict_single_sample():
    model = PointMassModel(mass=2.0, dt=0.05, state_dim=4, action_dim=2,
                           dtype=jnp.float64)
    params = model.init_params()
    x = np.array([1.0, 0.5, -1.0, 0.2])
    u = np.array([0.3, -0.7])
    got = model.predict(params, jnp.asarray(x), jnp.asarray(u))
    np.testing.assert_allclose(
        got, analytic_step(x[None], u[None], 0.05, 2.0)[0], rtol=1e-12
    )


def test_run_model_rollout():
    model = PointMassModel(mass=1.0, dt=0.1, state_dim=2, action_dim=1,
                           dtype=jnp.float64)
    params = model.init_params()
    x0 = jnp.asarray([0.0, 0.0])
    useq = jnp.ones((5, 1))
    traj = model.run_model(params, x0, useq)
    assert traj.shape == (6, 2)
    # velocity after n unit pushes of dt each: v = n*dt/m
    np.testing.assert_allclose(traj[-1, 1], 0.5, rtol=1e-12)


def test_mass_training_converges():
    """Gradient descent on mass recovers the true mass from transitions.

    Reference: scripts/test.py:220 (test_training) — the reference checks the
    mass variable converges under Adam; here plain GD on an MSE loss.
    """
    dt, true_mass = 0.1, 3.0
    model = PointMassModel(mass=1.0, dt=dt, state_dim=2, action_dim=1,
                           dtype=jnp.float64)
    params = model.init_params()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(64, 2)))
    u = jnp.asarray(rng.normal(size=(64, 1)))
    y = jnp.asarray(analytic_step(np.asarray(x), np.asarray(u), dt, true_mass))

    def loss(p):
        return jnp.mean((model.step(p, x, u) - y) ** 2)

    import optax

    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    grad = jax.jit(jax.grad(loss))
    for _ in range(500):
        g = grad(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
    assert abs(float(params["mass"]) - true_mass) < 1e-2
