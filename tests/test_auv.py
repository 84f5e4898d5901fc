"""AUV model tests against an independent numpy implementation of the
Fossen equations.

Mirrors the reference TestAUVModel strategy (scripts/test.py:237-586):
rotation/Jacobian validated against an independent quaternion implementation,
restoring/damping/Coriolis matrices against hand-built numpy, full steps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.models.auv import AUVModel, GRAVITY
from mppi_tf_tpu.ops import quaternion as quat


def rexrov2_params(rk=1):
    """The reference's demo parameter set (auv_model.py:568-596,
    config/models/rexrov2.default.yaml)."""
    return {
        "mass": 1862.87,
        "volume": 1.8121303501945525,
        "density": 1028.0,
        "cog": [0.0, 0.0, 0.0],
        "cob": [0.0, 0.0, 0.3],
        "Ma": [
            [779.79, -6.8773, -103.32, 8.5426, -165.54, -7.8033],
            [-6.8773, 1222.0, 51.29, 409.44, -5.8488, 62.726],
            [-103.32, 51.29, 3659.9, 6.1112, -386.42, 10.774],
            [8.5426, 409.44, 6.1112, 534.9, -10.027, 21.019],
            [-165.54, -5.8488, -386.42, -10.027, 842.69, -1.1162],
            [-7.8033, 62.726, 10.775, 21.019, -1.1162, 224.32],
        ],
        "linear_damping": [-70.0, -70.0, -700.0, -300.0, -300.0, -100.0],
        "quad_damping": [-740.0, -990.0, -1800.0, -670.0, -770.0, -520.0],
        "linear_damping_forward_speed": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        "inertial": {
            "ixx": 525.39, "iyy": 794.2, "izz": 691.23,
            "ixy": 1.44, "ixz": 33.41, "iyz": 2.6,
        },
        "rk": rk,
    }


def np_quat_rotmat(q):
    """Independent rotation matrix from xyzw quaternion."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def np_skew(v):
    return np.array([
        [0, -v[2], v[1]],
        [v[2], 0, -v[0]],
        [-v[1], v[0], 0],
    ], dtype=np.float64)


class NpAUV:
    """Independent numpy Fossen dynamics for cross-checking."""

    def __init__(self, p):
        self.p = p
        m = p["mass"]
        cog = np.asarray(p["cog"], np.float64)
        i = p["inertial"]
        inertia = np.array([
            [i["ixx"], i["ixy"], i["ixz"]],
            [i["ixy"], i["iyy"], i["iyz"]],
            [i["ixz"], i["iyz"], i["izz"]],
        ])
        m_rb = np.block([
            [m * np.eye(3), -m * np_skew(cog)],
            [m * np_skew(cog), inertia],
        ])
        self.m_tot = m_rb + np.asarray(p["Ma"], np.float64)
        self.inv_m = np.linalg.inv(self.m_tot)
        self.lin_d = np.diag(np.asarray(p["linear_damping"], np.float64))
        self.quad_d = np.asarray(p["quad_damping"], np.float64)
        self.fwd_d = np.diag(
            np.asarray(p["linear_damping_forward_speed"], np.float64))

    def damping(self, v):
        return -self.lin_d - v[0] * self.fwd_d - np.diag(self.quad_d * np.abs(v))

    def coriolis(self, v):
        s12 = -np_skew(self.m_tot[:3, :3] @ v[:3] + self.m_tot[:3, 3:] @ v[3:])
        s22 = -np_skew(self.m_tot[3:, :3] @ v[:3] + self.m_tot[3:, 3:] @ v[3:])
        return np.block([[np.zeros((3, 3)), s12], [s12, s22]])

    def restoring(self, q):
        p = self.p
        R = np_quat_rotmat(q)
        fng = -p["mass"] * GRAVITY * np.array([0.0, 0.0, 1.0])
        fnb = p["volume"] * p["density"] * GRAVITY * np.array([0.0, 0.0, 1.0])
        fbg = R.T @ fng
        fbb = R.T @ fnb
        mbg = np.cross(np.asarray(p["cog"], np.float64), fbg)
        mbb = np.cross(np.asarray(p["cob"], np.float64), fbb)
        return -np.concatenate([fbg + fbb, mbg + mbb])

    def state_dot(self, x, u):
        q = x[3:7]
        v = x[7:13]
        R = np_quat_rotmat(q)
        qx, qy, qz, qw = q
        T = 0.5 * np.array([
            [qw, -qz, qy],
            [qz, qw, -qx],
            [-qy, qx, qw],
            [-qx, -qy, -qz],
        ])
        pos_dot = R @ v[:3]
        quat_dot = T @ v[3:]
        rhs = u - self.coriolis(v) @ v - self.damping(v) @ v - self.restoring(q)
        v_dot = self.inv_m @ rhs
        return np.concatenate([pos_dot, quat_dot, v_dot])

    def step_rk1(self, x, u, dt):
        nxt = x + dt * self.state_dot(x, u)
        nxt[3:7] /= np.linalg.norm(nxt[3:7])
        return nxt

    def step_rk4(self, x, u, dt):
        """Standard RK4 (the reference's rk==4 branch mis-scales k4 by dt,
        auv_model.py:297-301 — our model deliberately uses the textbook
        weighting, models/auv.py step docstring)."""
        k1 = self.state_dot(x, u)
        k2 = self.state_dot(x + dt * k1 / 2.0, u)
        k3 = self.state_dot(x + dt * k2 / 2.0, u)
        k4 = self.state_dot(x + dt * k3, u)
        nxt = x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        nxt[3:7] /= np.linalg.norm(nxt[3:7])
        return nxt


def _mk(rk=1):
    model = AUVModel(rexrov2_params(rk=rk), dt=0.1, dtype=jnp.float64)
    return model, model.init_params(), NpAUV(rexrov2_params())


def _rand_state(rng, k):
    x = rng.normal(size=(k, 13))
    x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=-1, keepdims=True)
    return x


class TestAUVTerms:
    def setup_method(self):
        self.model, self.params, self.npm = _mk()
        self.rng = np.random.default_rng(11)

    def test_mass_matrix(self):
        m_tot, inv_m = self.model._mass_matrices(self.params)
        np.testing.assert_allclose(m_tot, self.npm.m_tot, rtol=1e-12)
        np.testing.assert_allclose(inv_m, self.npm.inv_m, rtol=1e-9)

    def test_damping(self):
        v = self.rng.normal(size=(4, 6))
        D = self.model.damping_matrix(jnp.asarray(v))
        for i in range(4):
            np.testing.assert_allclose(D[i], self.npm.damping(v[i]), rtol=1e-12)

    def test_coriolis(self):
        v = self.rng.normal(size=(4, 6))
        m_tot, _ = self.model._mass_matrices(self.params)
        C = self.model.coriolis_matrix(m_tot, jnp.asarray(v))
        for i in range(4):
            np.testing.assert_allclose(C[i], self.npm.coriolis(v[i]),
                                       rtol=1e-9, atol=1e-9)

    def test_restoring(self):
        x = _rand_state(self.rng, 5)
        R = quat.to_rotation_matrix(jnp.asarray(x[:, 3:7]))
        g = self.model.restoring_forces(self.params, R)
        for i in range(5):
            np.testing.assert_allclose(g[i], self.npm.restoring(x[i, 3:7]),
                                       rtol=1e-9, atol=1e-9)

    def test_state_dot(self):
        x = _rand_state(self.rng, 3)
        u = self.rng.normal(size=(3, 6)) * 100.0
        xd = self.model.state_dot(self.params, jnp.asarray(x), jnp.asarray(u))
        for i in range(3):
            np.testing.assert_allclose(
                xd[i], self.npm.state_dot(x[i], u[i]), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("rk", [1, 2, 4])
def test_step_shapes_and_quat_norm(rk):
    model, params, _ = _mk(rk=rk)
    rng = np.random.default_rng(12)
    x = _rand_state(rng, 6)
    u = rng.normal(size=(6, 6)) * 50.0
    nxt = np.asarray(model.step(params, jnp.asarray(x), jnp.asarray(u)))
    assert nxt.shape == (6, 13)
    np.testing.assert_allclose(
        np.linalg.norm(nxt[:, 3:7], axis=-1), 1.0, rtol=1e-12)


def test_step_rk1_matches_numpy():
    model, params, npm = _mk(rk=1)
    rng = np.random.default_rng(13)
    x = _rand_state(rng, 4)
    u = rng.normal(size=(4, 6)) * 100.0
    nxt = np.asarray(model.step(params, jnp.asarray(x), jnp.asarray(u)))
    for i in range(4):
        np.testing.assert_allclose(nxt[i], npm.step_rk1(x[i], u[i], 0.1),
                                   rtol=1e-8, atol=1e-10)


def test_step_rk4_matches_numpy():
    model, params, npm = _mk(rk=4)
    rng = np.random.default_rng(29)
    x = _rand_state(rng, 4)
    u = rng.normal(size=(4, 6)) * 100.0
    nxt = np.asarray(model.step(params, jnp.asarray(x), jnp.asarray(u)))
    for i in range(4):
        np.testing.assert_allclose(nxt[i], npm.step_rk4(x[i], u[i], 0.1),
                                   rtol=1e-8, atol=1e-10)


def test_neutral_buoyancy_equilibrium():
    """A neutrally-buoyant vehicle (mass*g == rho*V*g) at rest with cob=cog
    stays at rest."""
    p = rexrov2_params()
    p["mass"] = p["volume"] * p["density"]
    p["cob"] = [0.0, 0.0, 0.0]
    model = AUVModel(p, dt=0.1, dtype=jnp.float64)
    params = model.init_params()
    x = np.zeros((1, 13))
    x[0, 6] = 1.0  # identity quat
    u = np.zeros((1, 6))
    nxt = np.asarray(model.step(params, jnp.asarray(x), jnp.asarray(u)))
    np.testing.assert_allclose(nxt, x, atol=1e-10)


def test_parameter_validation():
    with pytest.raises(AssertionError):
        AUVModel({"mass": -1.0}, dtype=jnp.float64)
    p = rexrov2_params()
    del p["cog"]
    with pytest.raises(AssertionError):
        AUVModel(p, dtype=jnp.float64)


def test_jacobian_maps_velocity():
    model, params, npm = _mk()
    rng = np.random.default_rng(14)
    x = _rand_state(rng, 2)
    J = np.asarray(model.get_jacobian(jnp.asarray(x)))
    assert J.shape == (2, 7, 6)
    for i in range(2):
        pose_dot = J[i] @ x[i, 7:13]
        full = npm.state_dot(x[i], np.zeros(6))
        np.testing.assert_allclose(pose_dot, full[:7], rtol=1e-9, atol=1e-9)


def test_acc_matches_matrix_forms():
    """acc's direct D nu / C nu computation == the explicit matrix forms
    (damping_matrix / coriolis_matrix are the testable references)."""
    import jax.numpy as jnp
    import numpy as np

    model, params, _ = _mk(rk=1)
    rng = np.random.RandomState(11)
    k = 7
    vel = jnp.asarray(rng.randn(k, 6), model.dtype)
    q = rng.randn(k, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    from mppi_tf_tpu.ops import quaternion as quat

    rot = quat.to_rotation_matrix(jnp.asarray(q, model.dtype))
    tau_in = jnp.asarray(rng.randn(k, 6), model.dtype)

    got = model.acc(params, vel, tau_in, rot)

    m_tot, inv_m = model._mass_matrices(params)
    D = model.damping_matrix(vel)
    C = model.coriolis_matrix(m_tot, vel)
    Dv = jnp.einsum("kij,kj->ki", D, vel)
    Cv = jnp.einsum("kij,kj->ki", C, vel)
    g = model.restoring_forces(params, rot)
    want = (tau_in - Cv - Dv - g) @ inv_m.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)
