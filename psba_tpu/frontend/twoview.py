"""Two-view geometry (jitted): essential matrix, pose, triangulation.

Normalized 8-point algorithm over all valid correspondences (least squares
via SVD), E projection to the essential manifold, the four-fold (R, t)
decomposition disambiguated by cheirality voting, and batched DLT
triangulation. All fixed-shape; invalid correspondences carry zero weight.
"""

from __future__ import annotations

import functools

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


def sampson_sq(E, x1, x2):
    """Squared Sampson distance of correspondences under E (first-order
    geometric error in normalized image coordinates). [N]."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=1)           # [N, 3]
    p2 = jnp.concatenate([x2, ones], axis=1)
    Ex1 = p1 @ E.T                                     # [N, 3]
    Etx2 = p2 @ E
    num = jnp.sum(p2 * Ex1, axis=1) ** 2
    den = (
        Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
        + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    )
    return num / (den + 1e-18)


def _essential_minimal(xs1, xs2):
    """8-point solve on one minimal sample ([8, 2] each), with per-sample
    Hartley normalization. Returns a unit-norm E candidate."""
    dt = xs1.dtype

    def norm8(x):
        mean = jnp.mean(x, axis=0)
        d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=1))
        scale = jnp.sqrt(2.0) / (jnp.mean(d) + 1e-9)
        return (x - mean) * scale, mean, scale

    x1n, m1, s1 = norm8(xs1)
    x2n, m2, s2 = norm8(xs2)
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
         jnp.ones_like(u1)], axis=1,
    )
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    T1 = jnp.array([[s1, 0, -s1 * m1[0]], [0, s1, -s1 * m1[1]],
                    [0, 0, 1.0]], dt)
    T2 = jnp.array([[s2, 0, -s2 * m2[0]], [0, s2, -s2 * m2[1]],
                    [0, 0, 1.0]], dt)
    F = T2.T @ F @ T1
    U, s, Vt = jnp.linalg.svd(F)
    sbar = 0.5 * (s[0] + s[1])
    E = U @ jnp.diag(jnp.array([sbar, sbar, 0.0], dt)) @ Vt
    return E / (jnp.linalg.norm(E) + 1e-12)


@functools.partial(jax.jit, static_argnames=("iters",))
def essential_ransac(x1, x2, valid, key, iters: int = 64,
                     thresh: float = 2e-3):
    """Fixed-iteration (static-shape) RANSAC around the 8-point solver.

    A single weighted least-squares E is skewed by any outlier that
    survives descriptor filtering; this resamples `iters` minimal 8-point
    hypotheses (jit-compatible: the loop is a vmap over a fixed iteration
    count), scores each by the Sampson inlier count at `thresh` (squared
    normalized-coordinate distance ~ (px / f)^2), and re-estimates E by
    weighted least squares over the winning consensus set. No reference
    counterpart (the reference has no front-end; north-star scope).

    Returns (E, inliers [N] bool)."""
    w = valid.astype(x1.dtype)
    # sample minimal sets from the valid correspondences only
    p = w / (jnp.sum(w) + 1e-9)
    idx = jax.random.choice(
        key, x1.shape[0], shape=(iters, 8), replace=True, p=p
    )

    def hypothesis(ix):
        E = _essential_minimal(x1[ix], x2[ix])
        d = sampson_sq(E, x1, x2)
        inl = (d < thresh * thresh) & valid
        return E, jnp.sum(inl.astype(x1.dtype))

    Es, scores = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(scores)
    E0 = Es[best]
    inliers = (sampson_sq(E0, x1, x2) < thresh * thresh) & valid
    # consensus re-estimation (falls back to the hypothesis when the
    # consensus set is degenerate-small)
    E = jax.lax.cond(
        jnp.sum(inliers) >= 8,
        lambda: essential_8pt(x1, x2, inliers),
        lambda: E0,
    )
    return E, inliers


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
