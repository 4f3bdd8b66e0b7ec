"""Two-view geometry (jitted): essential matrix, pose, triangulation.

Normalized 8-point algorithm over all valid correspondences (least squares
via SVD), E projection to the essential manifold, the four-fold (R, t)
decomposition disambiguated by cheirality voting, and batched DLT
triangulation. All fixed-shape; invalid correspondences carry zero weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize_pts(x, w):
    """Hartley normalization with weights w [N]."""
    wsum = jnp.sum(w) + 1e-9
    mean = jnp.sum(x * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=1)) * w
    scale = jnp.sqrt(2.0) / (jnp.sum(d) / wsum + 1e-9)
    T = jnp.array(
        [[scale, 0, -scale * mean[0]],
         [0, scale, -scale * mean[1]],
         [0, 0, 1.0]]
    )
    xn = (x - mean) * scale
    return xn, T


@jax.jit
def essential_8pt(x1, x2, valid):
    """Essential matrix from calibrated correspondences.

    x1, x2: [N, 2] normalized image coordinates (K already removed);
    valid: [N] bool weights. Returns E [3,3] with the essential-manifold
    projection (equal singular values, third zero)."""
    w = valid.astype(x1.dtype)
    x1n, T1 = _normalize_pts(x1, w)
    x2n, T2 = _normalize_pts(x2, w)
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=1
    ) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[-1].reshape(3, 3)
    F = T2.T @ F @ T1
    # project to essential manifold
    U, s, Vt = jnp.linalg.svd(F)
    sbar = 0.5 * (s[0] + s[1])
    E = U @ jnp.diag(jnp.array([sbar, sbar, 0.0], F.dtype)) @ Vt
    return E / (jnp.linalg.norm(E) + 1e-12)


def _triangulate_pair(P1, P2, x1, x2):
    """DLT triangulation for one correspondence (two 3x4 cameras)."""
    A = jnp.stack(
        [
            x1[0] * P1[2] - P1[0],
            x1[1] * P1[2] - P1[1],
            x2[0] * P2[2] - P2[0],
            x2[1] * P2[2] - P2[1],
        ]
    )
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[-1]
    return Xh[:3] / Xh[3]


@jax.jit
def triangulate(R, t, x1, x2):
    """Triangulate [N] correspondences for cameras P1=[I|0], P2=[R|t]."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    return jax.vmap(lambda a, b: _triangulate_pair(P1, P2, a, b))(x1, x2)


@jax.jit
def decompose_essential(E, x1, x2, valid):
    """(R, t) from E by cheirality voting over the four candidates
    (positive depth in both views, weighted by `valid`)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    Wm = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    Ra = U @ Wm @ Vt
    Rb = U @ Wm.T @ Vt
    tu = U[:, 2]
    cands = [(Ra, tu), (Ra, -tu), (Rb, tu), (Rb, -tu)]
    w = valid.astype(E.dtype)

    def votes(R, t):
        X = triangulate(R, t, x1, x2)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        return jnp.sum(((z1 > 0) & (z2 > 0)).astype(E.dtype) * w)

    vs = jnp.stack([votes(R, t) for R, t in cands])
    best = jnp.argmax(vs)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]
