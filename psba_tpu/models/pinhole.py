"""Pinhole camera projection.

Intrinsics layout K = [fu, u0, v0, ar, s] per camera (fixed during
optimization), matching the reference file format ("# fu, u0, v0, ar, s",
data/7camsvarK.txt) and kernel usage (compute_exQT.cl:68-69):

    u = (fu * Xc + s * Yc + u0 * Zc) / Zc
    v = (fu * ar * Yc + v0 * Zc) / Zc

Distortion coefficients present in varKD-style files are parsed and dropped
before optimization, as in the reference driver (PSBA/main.cpp:140-149).
"""

from __future__ import annotations

import jax.numpy as jnp

from psba_tpu.models.quaternion import compose_local, quat_rotate


def project(K, pc):
    """Project camera-frame points pc [..., 3] with intrinsics K [..., 5].

    Returns pixel coordinates [..., 2]. Written exactly as the reference's
    rational form (numerators include the principal-point term) so that f64
    results agree to the last ulp-scale rounding with the OpenCL kernel.
    """
    fu, u0, v0, ar, sk = (K[..., i] for i in range(5))
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    inv_z = 1.0 / z
    u = (fu * x + sk * y + u0 * z) * inv_z
    v = (fu * ar * y + v0 * z) * inv_z
    return jnp.stack([u, v], axis=-1)


def project_quat(K, q0, v, t, X, clamp: bool = False):
    """Full prediction x̂ = proj(K, R(q_local(v) (x) q0) X + t).

    K [..., 5], q0 [..., 4], v [..., 3], t [..., 3], X [..., 3] -> [..., 2].
    This is the forward model whose Jacobian the solver linearizes
    (reference: kern_compute_exQT, CL_files/compute_exQT.cl:18-71).
    """
    q = compose_local(v, q0, clamp=clamp)
    pc = quat_rotate(q, X) + t
    return project(K, pc)
