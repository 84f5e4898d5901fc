"""Quaternion operations (xyzw convention), batched over a leading axis.

The reference leans on tensorflow_graphics for quaternion math
(scripts/src/models/auv_model.py:353-398, scripts/src/costs/elipse_cost.py:160-179,
scripts/src/models/nn_model.py:564-588). tfg has no JAX analogue, so the ops
are implemented here directly. Convention matches the reference throughout:
quaternions are stored as ``[qx, qy, qz, qw]`` (scalar last), matching the
AUV state layout ``[x y z | qx qy qz qw | u v w p q r]``.

All functions are pure, jit/vmap-friendly, and operate on ``[..., 4]`` /
``[..., 3]`` arrays with arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize quaternions. Reference: auv_model.py:426-448."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2 in xyzw convention.

    Matches tfg.geometry.transformation.quaternion.multiply as used by
    elipse_cost.py:172.
    """
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    x = x1 * w2 + y1 * z2 - z1 * y2 + w1 * x2
    y = -x1 * z2 + y1 * w2 + z1 * x2 + w1 * y2
    z = x1 * y2 - y1 * x2 + z1 * w2 + w1 * z2
    w = -x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2
    return jnp.stack([x, y, z, w], axis=-1)


def conjugate(q: jax.Array) -> jax.Array:
    """Quaternion conjugate (inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def to_rotation_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix R (body->inertial) from quaternion. [..., 4] -> [..., 3, 3].

    Exactly the expansion the reference builds row-by-row in
    auv_model.py:353-387 (``body2inertial_transform``).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotate(point: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate ``point`` [..., 3] by quaternion ``q`` [..., 4].

    Matches tfg.geometry.transformation.quaternion.rotate as used by
    elipse_cost.py:170.
    """
    padding = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    p = jnp.concatenate([point, padding], axis=-1)
    return multiply(multiply(q, p), conjugate(q))[..., :3]


def attitude_jacobian(q: jax.Array) -> jax.Array:
    """T_q(q): maps body angular velocity to quaternion rate. [..., 4] -> [..., 4, 3].

    q_dot = T_q(q) @ omega, with quaternion stored xyzw. Exactly the rows the
    reference assembles in auv_model.py:388-398 (rxt, ryt, rzt, rwt, scaled
    by 0.5).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    t = jnp.stack(
        [
            w, -z, y,
            z, w, -x,
            -y, x, w,
            -x, -y, -z,
        ],
        axis=-1,
    )
    return 0.5 * t.reshape(q.shape[:-1] + (4, 3))


def from_rotation_matrix(R: jax.Array) -> jax.Array:
    """Quaternion (xyzw) from rotation matrix, robust Shepperd's method.

    Matches tfg.geometry.transformation.quaternion.from_rotation_matrix as
    used by elipse_cost.py:163. [..., 3, 3] -> [..., 4].
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically best per element.
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    sw = safe_sqrt(1.0 + tr)  # 2w = sw * ...
    qw0 = jnp.stack(
        [(m21 - m12), (m02 - m20), (m10 - m01), sw * sw], axis=-1
    ) / (2.0 * sw)[..., None]
    sx = safe_sqrt(1.0 + m00 - m11 - m22)
    qx0 = jnp.stack(
        [sx * sx, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (2.0 * sx)[..., None]
    sy = safe_sqrt(1.0 - m00 + m11 - m22)
    qy0 = jnp.stack(
        [(m01 + m10), sy * sy, (m12 + m21), (m02 - m20)], axis=-1
    ) / (2.0 * sy)[..., None]
    sz = safe_sqrt(1.0 - m00 - m11 + m22)
    qz0 = jnp.stack(
        [(m02 + m20), (m12 + m21), sz * sz, (m10 - m01)], axis=-1
    ) / (2.0 * sz)[..., None]

    cond_w = (tr > 0.0)[..., None]
    cond_x = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_y = (m11 >= m22)[..., None]
    q = jnp.where(cond_w, qw0, jnp.where(cond_x, qx0, jnp.where(cond_y, qy0, qz0)))
    return normalize(q)


def between_two_vectors(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Smallest-angle quaternion rotating unit-ish v1 onto v2 ([..., 3] each).

    Matches tfg.geometry.transformation.quaternion.between_two_vectors_3d as
    used by elipse_cost.py:224.
    """
    cross = jnp.cross(v1, v2)
    dot = jnp.sum(v1 * v2, axis=-1, keepdims=True)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    w = n1 * n2 + dot
    q = jnp.concatenate([cross, w], axis=-1)
    # Antiparallel fallback: rotate pi about any axis orthogonal to v1.
    ortho = jnp.cross(v1, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], v1.dtype), v1.shape))
    ortho2 = jnp.cross(v1, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], v1.dtype), v1.shape))
    ortho = jnp.where(
        jnp.linalg.norm(ortho, axis=-1, keepdims=True) > 1e-6, ortho, ortho2
    )
    anti = jnp.concatenate([ortho, jnp.zeros_like(w)], axis=-1)
    degenerate = w < 1e-10 * n1 * n2
    q = jnp.where(degenerate, anti, q)
    return normalize(q)


def relative_angle(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angle of the relative rotation between two quaternions. [...,4]x2 -> [...].

    Matches tfg.geometry.transformation.quaternion.relative_angle as used by
    elipse_cost.py:225.
    """
    q1 = normalize(q1)
    q2 = normalize(q2)
    dot = jnp.sum(q1 * q2, axis=-1)
    dot = jnp.clip(dot, -1.0, 1.0)
    return 2.0 * jnp.arccos(jnp.abs(dot))


def to_euler(q: jax.Array) -> jax.Array:
    """Quaternion (xyzw) -> intrinsic XYZ euler angles [roll, pitch, yaw].

    Matches tfg.geometry.transformation.euler.from_quaternion as used by
    nn_model.py:564-588 (NNAUVModelSpeed input encoding).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.arcsin(jnp.clip(sinp, -1.0, 1.0))

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric (cross-product) matrix of [..., 3] -> [..., 3, 3].

    Reference: auv_model.py:9-77 (skew_op / tf_skew_op_k).
    """
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    s = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero],
        axis=-1,
    )
    return s.reshape(v.shape[:-1] + (3, 3))
