"""Front-end pipeline: images / correspondences -> BAProblem.

`two_view_problem` runs the full jitted chain (detect -> describe ->
match -> essential -> pose -> triangulate) on an image pair and emits a
BAProblem for the BA core. `build_problem_from_tracks` assembles a
multi-view problem from externally tracked correspondences (the pose-graph
entry point: poses chained from pairwise estimates)."""

from __future__ import annotations

import numpy as np

from psba_tpu.io.synthetic import _mat_to_quat
from psba_tpu.problem import BAProblem


def two_view_problem(img1, img2, K, n_features: int = 256) -> BAProblem:
    """Detect/match/estimate/triangulate an image pair into a BAProblem.

    K: [fu, u0, v0, ar, s] shared intrinsics. Camera 1 is gauge-fixed at
    identity; camera 2 takes the essential-matrix pose (unit-norm
    translation — BA refines up to the usual gauge freedom)."""
    import jax.numpy as jnp

    from psba_tpu.frontend.features import detect_and_describe
    from psba_tpu.frontend.matching import match_descriptors
    from psba_tpu.frontend.twoview import (
        decompose_essential,
        essential_8pt,
        triangulate,
    )

    xy1, s1, d1 = detect_and_describe(img1, k=n_features)
    xy2, s2, d2 = detect_and_describe(img2, k=n_features)
    idx2, valid = match_descriptors(d1, d2, s1, s2)
    m1 = xy1
    m2 = xy2[idx2]

    fu, u0, v0, ar, sk = [float(v) for v in K]
    def norm(p):
        x = (p[:, 0] - u0 - sk * ((p[:, 1] - v0) / (fu * ar))) / fu
        y = (p[:, 1] - v0) / (fu * ar)
        return jnp.stack([x, y], axis=1)

    x1n, x2n = norm(m1), norm(m2)
    E = essential_8pt(x1n, x2n, valid)
    R, t = decompose_essential(E, x1n, x2n, valid)
    X = triangulate(R, t, x1n, x2n)
    z1 = X[:, 2]
    z2 = (X @ R.T + t)[:, 2]
    keep = np.asarray(valid & (z1 > 1e-3) & (z2 > 1e-3))

    X = np.asarray(X)[keep]
    m1k, m2k = np.asarray(m1)[keep], np.asarray(m2)[keep]
    P = len(X)

    Rm = np.stack([np.eye(3), np.asarray(R)])
    tm = np.stack([np.zeros(3), np.asarray(t)])
    q0 = np.stack([_mat_to_quat(Rm[0]), _mat_to_quat(Rm[1])])
    Kc = np.tile(np.asarray(K, np.float64), (2, 1))

    obs = np.empty((2 * P, 2))
    obs[0::2] = m1k
    obs[1::2] = m2k
    pt_idx = np.repeat(np.arange(P, dtype=np.int32), 2)
    cam_idx = np.tile(np.array([0, 1], np.int32), P)
    prob = BAProblem(
        K=Kc, q0=q0.astype(np.float64),
        cams=np.concatenate([np.zeros((2, 3)), tm], axis=1),
        pts=X.astype(np.float64), obs=obs,
        cam_idx=cam_idx, pt_idx=pt_idx,
    )
    prob.validate()
    return prob


def build_problem_from_tracks(K, q0, t, tracks) -> BAProblem:
    """Assemble a BAProblem from feature tracks.

    tracks: list of (X0 [3] initial point, [(cam, u, v), ...]) — e.g. the
    output of chaining pairwise front-end estimates into a pose graph.
    Cameras come in as (q0 [C,4] quaternions, t [C,3]); local rotation
    starts at zero as in the text-file path (main.cpp:131-136)."""
    pts, obs, cam_idx, pt_idx = [], [], [], []
    for i, (X0, views) in enumerate(tracks):
        if len(views) < 2:
            continue
        pi = len(pts)
        pts.append(np.asarray(X0, np.float64))
        for (c, u, v) in views:
            obs.append((u, v))
            cam_idx.append(c)
            pt_idx.append(pi)
    C = len(q0)
    prob = BAProblem(
        K=np.asarray(K, np.float64).reshape(C, 5),
        q0=np.asarray(q0, np.float64),
        cams=np.concatenate(
            [np.zeros((C, 3)), np.asarray(t, np.float64)], axis=1
        ),
        pts=np.stack(pts),
        obs=np.asarray(obs, np.float64),
        cam_idx=np.asarray(cam_idx, np.int32),
        pt_idx=np.asarray(pt_idx, np.int32),
    )
    prob.validate()
    return prob
