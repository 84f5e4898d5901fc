"""scipy-oracle tests for ops/quaternion.py (xyzw convention throughout).

The quaternion layer underpins the AUV dynamics (auv_model.py:353-448),
the quaternion costs (static_cost.py:73-159, elipse_cost.py:101-246) and
the NN pose integration (nn_model.py:464-560); here each op is pinned
directly against scipy.spatial.transform (an implementation-independent
oracle), complementing the end-to-end reference-oracle tests.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from mppi_tf_tpu.ops import quaternion as quat


def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_multiply_matches_scipy(rng):
    q1, q2 = _rand_quats(rng, 32), _rand_quats(rng, 32)
    got = np.asarray(quat.multiply(jnp.asarray(q1), jnp.asarray(q2)))
    want = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
    # quaternion double cover: q and -q are the same rotation
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-6)


def test_to_rotation_matrix_matches_scipy(rng):
    q = _rand_quats(rng, 32)
    got = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
    want = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotate_matches_scipy(rng):
    q = _rand_quats(rng, 32)
    v = rng.normal(size=(32, 3))
    got = np.asarray(quat.rotate(jnp.asarray(v), jnp.asarray(q)))
    want = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_from_rotation_matrix_round_trip(rng):
    q = _rand_quats(rng, 64)
    R = Rotation.from_quat(q).as_matrix()
    got = np.asarray(quat.from_rotation_matrix(jnp.asarray(R)))
    # Shepperd's method covers all four trace branches; compare up to sign
    sign = np.sign(np.sum(got * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, q, atol=1e-6)


def test_to_euler_matches_scipy(rng):
    q = _rand_quats(rng, 64)
    got = np.asarray(quat.to_euler(jnp.asarray(q)))
    want = Rotation.from_quat(q).as_euler("xyz")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attitude_jacobian_is_quaternion_derivative(rng):
    """q' = normalize(q + T_q(q) omega dt) must converge to the exact
    axis-angle rotation as dt -> 0 (body-frame angular velocity)."""
    q = _rand_quats(rng, 8)
    om = rng.normal(size=(8, 3))
    dt = 1e-6
    tq = np.asarray(quat.attitude_jacobian(jnp.asarray(q)))
    qn = q + np.einsum("kij,kj->ki", tq, om) * dt
    qn /= np.linalg.norm(qn, axis=-1, keepdims=True)
    want = (Rotation.from_quat(q) * Rotation.from_rotvec(om * dt)).as_quat()
    sign = np.sign(np.sum(qn * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(qn * sign, want, atol=1e-9)


def test_relative_angle_matches_geodesic(rng):
    q1, q2 = _rand_quats(rng, 32), _rand_quats(rng, 32)
    got = np.asarray(quat.relative_angle(jnp.asarray(q1), jnp.asarray(q2)))
    want = (Rotation.from_quat(q1).inv() * Rotation.from_quat(q2)).magnitude()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_between_two_vectors(rng):
    v1 = rng.normal(size=(32, 3))
    v2 = rng.normal(size=(32, 3))
    # np.array (copy): scipy's from_quat rejects read-only jax buffers
    q = np.array(quat.between_two_vectors(jnp.asarray(v1),
                                          jnp.asarray(v2)))
    rotated = Rotation.from_quat(q).apply(v1)
    cos = np.sum(rotated * v2, axis=-1) / (
        np.linalg.norm(rotated, axis=-1) * np.linalg.norm(v2, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_skew_cross_product(rng):
    v = rng.normal(size=(16, 3))
    w = rng.normal(size=(16, 3))
    got = np.einsum("kij,kj->ki", np.asarray(quat.skew(jnp.asarray(v))), w)
    np.testing.assert_allclose(got, np.cross(v, w), atol=1e-6)


def test_normalize_and_conjugate(rng):
    q = rng.normal(size=(16, 4)) * 3.0
    n = np.asarray(quat.normalize(jnp.asarray(q)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
    c = np.asarray(quat.conjugate(jnp.asarray(q)))
    np.testing.assert_allclose(c[:, :3], -q[:, :3])
    np.testing.assert_allclose(c[:, 3], q[:, 3])
