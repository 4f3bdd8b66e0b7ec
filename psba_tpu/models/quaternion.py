"""Quaternion utilities (Hamilton convention, [w, x, y, z] layout).

The camera rotation model matches the reference: each camera carries a fixed
initial unit quaternion q0 and an optimized local rotation expressed only by
its vector part v, with scalar part s = sqrt(1 - ||v||^2). The effective
rotation is q_local(v) (x) q0 (quaternion product), applied to world points
as the sandwich q p q̄ (reference: CL_files/compute_exQT.cl:41-66,
PSBA/misc.cpp:8-11).

All functions are shape-polymorphic over leading batch axes and jit/vmap
friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def local_scalar(v, clamp: bool = False):
    """Scalar part s = sqrt(1 - ||v||^2) of a local rotation vector v [..., 3].

    The reference computes the raw sqrt, which produces NaN when the
    accumulated local vector exceeds unit norm; damping keeps it in range in
    practice (compute_exQT.cl:44). `clamp=True` guards the argument at zero —
    an intentional, opt-in behavioral improvement.
    """
    sq = 1.0 - jnp.sum(v * v, axis=-1)
    if clamp:
        sq = jnp.maximum(sq, 0.0)
    return jnp.sqrt(sq)


def quat_multiply(q, r):
    """Hamilton product q (x) r for [..., 4] quaternions in [w, x, y, z]."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + rw * qx + qy * rz - qz * ry,
            qw * ry + rw * qy + qz * rx - qx * rz,
            qw * rz + rw * qz + qx * ry - qy * rx,
        ],
        axis=-1,
    )


def compose_local(v, q0, clamp: bool = False):
    """Effective rotation q = q_local(v) (x) q0.

    v: [..., 3] local rotation vector part; q0: [..., 4] fixed initial unit
    quaternion. Matches compute_exQT.cl:44-49 (q_i * q_0 with q_i=(s_i, v_i)).
    """
    s = local_scalar(v, clamp=clamp)
    ql = jnp.concatenate([s[..., None], v], axis=-1)
    return quat_multiply(ql, q0)


def quat_rotate(q, p):
    """Rotate vectors p [..., 3] by unit quaternions q [..., 4].

    Uses the two-cross-product form R(q) p = p + 2 w (u x p) + 2 u x (u x p)
    (algebraically identical to the reference's sandwich product
    q (0,p) q̄, compute_exQT.cl:52-68)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = 2.0 * jnp.cross(u, p)
    return p + w * t + jnp.cross(u, t)


def quat_to_matrix(q):
    """Rotation matrix [..., 3, 3] from unit quaternion [..., 4].

    Same element layout as the reference's quat2matrix (PSBA/misc.cpp:93-113).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_normalize_vec(q):
    """Normalize full quaternions [..., 4] and return the vector part with the
    scalar forced non-negative (q and -q encode the same rotation).

    Matches the reference's quat2vec input filter (PSBA/misc.cpp:21-49): the
    result is the initial state of the optimized local rotation vector before
    it is zeroed, and the sign convention of the stored q0.
    """
    mag = jnp.linalg.norm(q, axis=-1, keepdims=True)
    sg = jnp.where(q[..., 0:1] >= 0.0, 1.0, -1.0)
    qn = q * (sg / mag)
    return qn[..., 1:4], qn
