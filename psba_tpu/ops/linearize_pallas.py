"""Fused Pallas TPU kernel: residual + Jacobian + Hessian-block assembly.

One pass over the observation stream replaces four reference kernels
(kern_compute_exQT, kern_compute_jacobiQT, kern_compute_U/V/Wblks/g;
CL_files/compute_exQT.cl, compute_jacobiQT.cl, compute_U.cl, compute_V.cl,
compute_Wblks.cl, compute_g.cl) and their HBM round-trips:

  per obs tile [T lanes]:  residual ex, prediction Jacobians A (2x6) and
  B (2x3), the Gram blocks A^T A | A^T ex (reduced over cameras in-kernel
  via a one-hot MXU contraction), B^T B | B^T ex (emitted per-obs for the
  sorted point segment-sum outside), W = A^T B, and the running sum of
  squared residuals.

Layout: all observation streams are transposed to [component, O] so the
observation axis rides the 128-wide lane dimension (SoA); a [O, k] layout
with k<128 would waste >95% of each vector register.

The math is the structured chain rule of psba_tpu.core.jacobian written in
scalar component form (verified against it in tests/test_pallas.py);
`[v]x[X0]x = X0 v^T - (v.X0) I` collapses the rotation-derivative terms.

float32 only (Mosaic has no f64); the f64 parity path stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # compiled Mosaic on TPU; interpreter elsewhere (CPU tests)
    return jax.default_backend() != "tpu"


def _forward_rows(kq, cam, X, clamp):
    """Shared forward model on [1,T] component rows.

    Returns (ex-ready projection terms and intermediates for the Jacobian).
    """
    fu, u0, v0, ar, sk = kq[0], kq[1], kq[2], kq[3], kq[4]
    a, b, c, d = kq[5], kq[6], kq[7], kq[8]
    v1, v2, v3 = cam[0], cam[1], cam[2]
    t1, t2, t3 = cam[3], cam[4], cam[5]
    x1, x2, x3 = X[0], X[1], X[2]

    s2 = 1.0 - v1 * v1 - v2 * v2 - v3 * v3
    if clamp:
        s2 = jnp.maximum(s2, 0.0)
    s = jnp.sqrt(s2)

    # X0 = R(q0) X via t0 = 2 u x X, X0 = X + a t0 + u x t0, u = (b,c,d)
    t01 = 2.0 * (c * x3 - d * x2)
    t02 = 2.0 * (d * x1 - b * x3)
    t03 = 2.0 * (b * x2 - c * x1)
    X01 = x1 + a * t01 + (c * t03 - d * t02)
    X02 = x2 + a * t02 + (d * t01 - b * t03)
    X03 = x3 + a * t03 + (b * t02 - c * t01)

    # w = v x X0
    w1 = v2 * X03 - v3 * X02
    w2 = v3 * X01 - v1 * X03
    w3 = v1 * X02 - v2 * X01

    # camera point pc = X0 + 2 s w + 2 v x w + t
    p1 = X01 + 2.0 * (s * w1 + v2 * w3 - v3 * w2) + t1
    p2 = X02 + 2.0 * (s * w2 + v3 * w1 - v1 * w3) + t2
    p3 = X03 + 2.0 * (s * w3 + v1 * w2 - v2 * w1) + t3

    iz = 1.0 / p3
    pu = (fu * p1 + sk * p2 + u0 * p3) * iz
    pv = (fu * ar * p2 + v0 * p3) * iz
    return dict(
        fu=fu, ar=ar, sk=sk, a=a, b=b, c=c, d=d,
        v=(v1, v2, v3), X0=(X01, X02, X03), w=(w1, w2, w3),
        p=(p1, p2, p3), iz=iz, s=s, pu=pu, pv=pv,
    )


def _jacobian_rows(f):
    """A [2][6] and B [2][3] component rows from forward intermediates."""
    fu, ar, sk, iz = f["fu"], f["ar"], f["sk"], f["iz"]
    p1, p2, _ = f["p"]
    v1, v2, v3 = f["v"]
    X01, X02, X03 = f["X0"]
    w1, w2, w3 = f["w"]
    s = f["s"]

    # dproj/dp_c rows
    du = (fu * iz, sk * iz, -(fu * p1 + sk * p2) * iz * iz)
    dv = (jnp.zeros_like(iz), fu * ar * iz, -(fu * ar * p2) * iz * iz)

    # dp_c/dv = g v^T + 2(v.X0) I - 2s [X0]x - 2 [w]x,
    #   g_i = -(2/s) w_i - 2 X0_i   (uses [v]x[X0]x = X0 v^T - (v.X0) I)
    inv_s = 1.0 / s
    g1 = -2.0 * (inv_s * w1 + X01)
    g2 = -2.0 * (inv_s * w2 + X02)
    g3 = -2.0 * (inv_s * w3 + X03)
    cdot = 2.0 * (v1 * X01 + v2 * X02 + v3 * X03)
    s2_ = 2.0 * s
    M = (
        (g1 * v1 + cdot, g1 * v2 + s2_ * X03 + 2 * w3,
         g1 * v3 - s2_ * X02 - 2 * w2),
        (g2 * v1 - s2_ * X03 - 2 * w3, g2 * v2 + cdot,
         g2 * v3 + s2_ * X01 + 2 * w1),
        (g3 * v1 + s2_ * X02 + 2 * w2, g3 * v2 - s2_ * X01 - 2 * w1,
         g3 * v3 + cdot),
    )

    # composed rotation matrix R(q), q = q_local(v) (x) q0
    a, b, c, d = f["a"], f["b"], f["c"], f["d"]
    qw = s * a - (v1 * b + v2 * c + v3 * d)
    qx = s * b + a * v1 + (v2 * d - v3 * c)
    qy = s * c + a * v2 + (v3 * b - v1 * d)
    qz = s * d + a * v3 + (v1 * c - v2 * b)
    R = (
        (1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)),
        (2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)),
        (2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)),
    )

    def rowdot(pr, Mcols):
        return tuple(
            pr[0] * Mcols[0][k] + pr[1] * Mcols[1][k] + pr[2] * Mcols[2][k]
            for k in range(3)
        )

    A = []
    B = []
    for pr in (du, dv):
        rot = rowdot(pr, M)
        A.append(rot + pr)        # 6 columns: rotation then translation
        B.append(rowdot(pr, R))
    return A, B


def _linearize_kernel(kq0_ref, obs_ref, camv_ref, X_ref, camidx_ref,
                      valid_ref, ex_ref, A_ref, B_ref, W_ref, ptpack_ref,
                      camred_ref, l2_ref, *, n_cams, clamp):
    kq = [kq0_ref[i:i + 1, :] for i in range(9)]
    cam = [camv_ref[i:i + 1, :] for i in range(6)]
    X = [X_ref[i:i + 1, :] for i in range(3)]
    f = _forward_rows(kq, cam, X, clamp)
    exu = obs_ref[0:1, :] - f["pu"]
    exv = obs_ref[1:2, :] - f["pv"]
    ex_ref[0:1, :] = exu
    ex_ref[1:2, :] = exv

    vmask = valid_ref[0:1, :].astype(exu.dtype)
    A, B = _jacobian_rows(f)
    # mask padded observations out of every quadratic quantity
    A = [tuple(x * vmask for x in row) for row in A]
    B = [tuple(x * vmask for x in row) for row in B]
    mexu, mexv = exu * vmask, exv * vmask

    for k in range(6):
        A_ref[k:k + 1, :] = A[0][k]
        A_ref[6 + k:7 + k, :] = A[1][k]
    for k in range(3):
        B_ref[k:k + 1, :] = B[0][k]
        B_ref[3 + k:4 + k, :] = B[1][k]

    # W = A^T B (6x3), row-major i*3+j
    for i in range(6):
        for j in range(3):
            W_ref[i * 3 + j:i * 3 + j + 1, :] = (
                A[0][i] * B[0][j] + A[1][i] * B[1][j]
            )

    # point pack: B^T B (9) | B^T ex (3)
    for i in range(3):
        for j in range(3):
            ptpack_ref[i * 3 + j:i * 3 + j + 1, :] = (
                B[0][i] * B[0][j] + B[1][i] * B[1][j]
            )
    for i in range(3):
        ptpack_ref[9 + i:10 + i, :] = B[0][i] * mexu + B[1][i] * mexv

    # camera pack rows [42, T]: A^T A (36) | A^T ex (6), reduced in-kernel
    rows = []
    for i in range(6):
        for j in range(6):
            rows.append(A[0][i] * A[0][j] + A[1][i] * A[1][j])
    for i in range(6):
        rows.append(A[0][i] * mexu + A[1][i] * mexv)
    cam_pack = jnp.concatenate(rows, axis=0)              # [42, T]

    T = cam_pack.shape[1]
    cam_row = camidx_ref[0:1, :]                          # [1, T] int32
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_cams, T), 0) == cam_row
    ).astype(cam_pack.dtype)                              # [C, T]
    part = jax.lax.dot_general(
        cam_pack, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=cam_pack.dtype,
        precision=jax.lax.Precision.HIGHEST,  # keep f32 multiplies: the
        # MXU default rounds the data operand to bf16 (~4e-3 rel in U/ga)
    )                                                     # [42, C]
    l2_part = jnp.sum(mexu * exu + mexv * exv)

    @pl.when(pl.program_id(0) == 0)
    def _():
        camred_ref[:, :] = jnp.zeros_like(camred_ref)
        l2_ref[0, 0] = jnp.zeros_like(l2_ref[0, 0])

    camred_ref[:, :] += part
    l2_ref[0, 0] += l2_part


def _residual_kernel(kq0_ref, obs_ref, camv_ref, X_ref, valid_ref,
                     ex_ref, l2_ref, *, clamp):
    kq = [kq0_ref[i:i + 1, :] for i in range(9)]
    cam = [camv_ref[i:i + 1, :] for i in range(6)]
    X = [X_ref[i:i + 1, :] for i in range(3)]
    f = _forward_rows(kq, cam, X, clamp)
    exu = obs_ref[0:1, :] - f["pu"]
    exv = obs_ref[1:2, :] - f["pv"]
    ex_ref[0:1, :] = exu
    ex_ref[1:2, :] = exv
    vmask = valid_ref[0:1, :].astype(exu.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        l2_ref[0, 0] = jnp.zeros_like(l2_ref[0, 0])

    l2_ref[0, 0] += jnp.sum((exu * exu + exv * exv) * vmask)


def _pad_streams(streams, O, T):
    """Pad [k, O] streams on the last axis to a T multiple by duplicating
    column 0 (keeps padded math finite; callers mask via `valid`)."""
    O_pad = ((O + T - 1) // T) * T
    if O_pad == O:
        return streams, O_pad
    out = []
    for s in streams:
        first = s[:, :1]
        pad = jnp.broadcast_to(first, (s.shape[0], O_pad - O))
        out.append(jnp.concatenate([s, pad], axis=1))
    return out, O_pad


def _prep_streams(K, q0, cams, pts, obs, cam_idx, pt_idx, valid):
    """Gather + transpose the observation streams (XLA side)."""
    f32 = jnp.float32
    kq0 = jnp.concatenate(
        [K[cam_idx], q0[cam_idx]], axis=1
    ).astype(f32).T                                       # [9, O]
    camv = cams[cam_idx].astype(f32).T                    # [6, O]
    X = pts[pt_idx].astype(f32).T                         # [3, O]
    obs_t = obs.astype(f32).T                             # [2, O]
    O = obs.shape[0]
    if valid is None:
        valid_t = jnp.ones((1, O), f32)
    else:
        valid_t = valid.astype(f32)[None, :]
    camidx_t = cam_idx.astype(jnp.int32)[None, :]
    return kq0, obs_t, camv, X, camidx_t, valid_t, O


@functools.partial(
    jax.jit,
    static_argnames=("n_cams", "n_pts", "clamp", "want_jac", "want_point",
                     "want_w"),
)
def linearize_pallas(K, q0, cams, pts, obs, cam_idx, pt_idx, valid,
                     n_cams, n_pts, clamp=False, want_jac=False,
                     want_point=True, want_w=True):
    """Fused linearization. Returns (ex [O,2], ex_l2, U, V, W, ga, gb,
    A or None, B or None) — coeff-free (callers scale per LM/TR convention).
    `want_point=False` skips the point-side segment reduction (V/gb slots
    are None) and `want_w=False` skips the W relayout — the dense planar
    path gets all three from ops.linearize_dense_pallas and only needs
    U/ga here.
    """
    kq0, obs_t, camv, X, camidx_t, valid_t, O = _prep_streams(
        K, q0, cams, pts, obs, cam_idx, pt_idx, valid
    )
    T = 512 if O >= 512 else 128
    (kq0, obs_t, camv, X), O_pad = _pad_streams([kq0, obs_t, camv, X], O, T)
    (camidx_t,), _ = _pad_streams([camidx_t], O, T)
    (valid_t,), _ = _pad_streams([valid_t], O, T)
    if O_pad != O:
        # padded columns must be masked regardless of the caller's mask
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, O_pad), 1)
        valid_t = jnp.where(lane < O, valid_t, 0.0)

    C = n_cams
    grid = (O_pad // T,)
    # index maps must return i32 scalars: a Python 0 traces as i64 under
    # jax_enable_x64 and Mosaic rejects the mixed (i64, i32) index tuple
    row_spec = lambda k: pl.BlockSpec(
        (k, T), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_linearize_kernel, n_cams=C, clamp=clamp)
    ex_t, A_t, B_t, W_t, ptpack_t, camred, l2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(9), row_spec(2), row_spec(6), row_spec(3),
                  row_spec(1), row_spec(1)],
        out_specs=[
            row_spec(2), row_spec(12), row_spec(6), row_spec(18),
            row_spec(12),
            pl.BlockSpec((42, C), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, O_pad), jnp.float32),
            jax.ShapeDtypeStruct((12, O_pad), jnp.float32),
            jax.ShapeDtypeStruct((6, O_pad), jnp.float32),
            jax.ShapeDtypeStruct((18, O_pad), jnp.float32),
            jax.ShapeDtypeStruct((12, O_pad), jnp.float32),
            jax.ShapeDtypeStruct((42, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(kq0, obs_t, camv, X, camidx_t, valid_t)

    ex = ex_t[:, :O].T
    W = W_t[:, :O].T.reshape(O, 6, 3) if want_w else None
    if want_point:
        pt_pack = ptpack_t[:, :O].T                        # [O,12]
        pt_red = jax.ops.segment_sum(
            pt_pack, pt_idx, num_segments=n_pts, indices_are_sorted=True
        )
        V = pt_red[:, :9].reshape(n_pts, 3, 3)
        gb = pt_red[:, 9:]
    else:
        V = gb = None
    U = camred[:36].T.reshape(C, 6, 6)
    ga = camred[36:].T
    A = A_t[:, :O].T.reshape(O, 2, 6) if want_jac else None
    B = B_t[:, :O].T.reshape(O, 2, 3) if want_jac else None
    return ex, l2[0, 0], U, V, W, ga, gb, A, B


@functools.partial(jax.jit, static_argnames=("clamp",))
def residual_l2_pallas(K, q0, cams, pts, obs, cam_idx, pt_idx, valid,
                       clamp=False):
    """Fused trial-step residual + sum of squares (kern_compute_exQT +
    the host-side compute_L2_sq, levmar.cpp:188-193)."""
    kq0, obs_t, camv, X, _camidx, valid_t, O = _prep_streams(
        K, q0, cams, pts, obs, cam_idx, pt_idx, valid
    )
    T = 512 if O >= 512 else 128
    (kq0, obs_t, camv, X), O_pad = _pad_streams([kq0, obs_t, camv, X], O, T)
    (valid_t,), _ = _pad_streams([valid_t], O, T)
    if O_pad != O:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, O_pad), 1)
        valid_t = jnp.where(lane < O, valid_t, 0.0)

    # index maps must return i32 scalars: a Python 0 traces as i64 under
    # jax_enable_x64 and Mosaic rejects the mixed (i64, i32) index tuple
    row_spec = lambda k: pl.BlockSpec(
        (k, T), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    ex_t, l2 = pl.pallas_call(
        functools.partial(_residual_kernel, clamp=clamp),
        grid=(O_pad // T,),
        in_specs=[row_spec(9), row_spec(2), row_spec(6), row_spec(3),
                  row_spec(1)],
        out_specs=[
            row_spec(2),
            pl.BlockSpec((1, 1), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, O_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(kq0, obs_t, camv, X, valid_t)
    return ex_t[:, :O].T, l2[0, 0]
