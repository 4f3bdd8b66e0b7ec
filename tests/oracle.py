"""NumPy golden oracle.

Independent scalar/loop implementation of the projection model along the
same mathematical path as the reference's CPU golden kernels
(PSBA/levmar_func_cpu.cpp): explicit quaternion sandwich q (0,X) q̄ via two
Hamilton products (a different computation path than the framework's
cross-product rotation), plus finite-difference Jacobians. Used as the test
oracle the reference only exercised manually (SURVEY.md §4.1)."""

from __future__ import annotations

import numpy as np


def quat_mul(q, r):
    w = q[0] * r[0] - q[1] * r[1] - q[2] * r[2] - q[3] * r[3]
    x = q[0] * r[1] + r[0] * q[1] + q[2] * r[3] - q[3] * r[2]
    y = q[0] * r[2] + r[0] * q[2] + q[3] * r[1] - q[1] * r[3]
    z = q[0] * r[3] + r[0] * q[3] + q[1] * r[2] - q[2] * r[1]
    return np.array([w, x, y, z])


def predict_one(K, q0, v, t, X):
    """Predicted projection of one point in one camera (scalar path)."""
    s = np.sqrt(1.0 - v @ v)
    q = quat_mul(np.concatenate([[s], v]), q0)
    p = quat_mul(quat_mul(q, np.concatenate([[0.0], X])),
                 np.array([q[0], -q[1], -q[2], -q[3]]))[1:]
    pc = p + t
    fu, u0, v0, ar, sk = K
    u = (fu * pc[0] + sk * pc[1] + u0 * pc[2]) / pc[2]
    w = (fu * ar * pc[1] + v0 * pc[2]) / pc[2]
    return np.array([u, w])


def residuals(prob, cams=None, pts=None):
    cams = prob.cams if cams is None else cams
    pts = prob.pts if pts is None else pts
    out = np.empty((prob.n_obs, 2))
    for o in range(prob.n_obs):
        j = prob.cam_idx[o]
        i = prob.pt_idx[o]
        pred = predict_one(
            prob.K[j], prob.q0[j], cams[j, :3], cams[j, 3:], pts[i]
        )
        out[o] = prob.obs[o] - pred
    return out


def jacobians_fd(prob, cams=None, pts=None, eps=1e-7):
    """Central finite-difference A [O,2,6], B [O,2,3] of the prediction."""
    cams = prob.cams if cams is None else cams
    pts = prob.pts if pts is None else pts
    O = prob.n_obs
    A = np.empty((O, 2, 6))
    B = np.empty((O, 2, 3))
    for o in range(O):
        j, i = prob.cam_idx[o], prob.pt_idx[o]
        cam = cams[j].copy()
        X = pts[i].copy()
        for k in range(6):
            cp, cm = cam.copy(), cam.copy()
            cp[k] += eps
            cm[k] -= eps
            fp = predict_one(prob.K[j], prob.q0[j], cp[:3], cp[3:], X)
            fm = predict_one(prob.K[j], prob.q0[j], cm[:3], cm[3:], X)
            A[o, :, k] = (fp - fm) / (2 * eps)
        for k in range(3):
            Xp, Xm = X.copy(), X.copy()
            Xp[k] += eps
            Xm[k] -= eps
            fp = predict_one(prob.K[j], prob.q0[j], cam[:3], cam[3:], Xp)
            fm = predict_one(prob.K[j], prob.q0[j], cam[:3], cam[3:], Xm)
            B[o, :, k] = (fp - fm) / (2 * eps)
    return A, B


def dense_jacobian(prob, A, B):
    """Assemble the full dense J [2O, 6C+3P] from per-observation blocks."""
    O, C, P = prob.n_obs, prob.n_cams, prob.n_pts
    J = np.zeros((2 * O, 6 * C + 3 * P))
    for o in range(O):
        j, i = prob.cam_idx[o], prob.pt_idx[o]
        J[2 * o : 2 * o + 2, 6 * j : 6 * j + 6] = A[o]
        J[2 * o : 2 * o + 2, 6 * C + 3 * i : 6 * C + 3 * i + 3] = B[o]
    return J
