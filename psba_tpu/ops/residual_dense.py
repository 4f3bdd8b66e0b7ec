"""Dense-grid Pallas TPU kernel for the trial-step gain ratio.

The LM/TR acceptance test needs exactly two scalars per trial step:
the actual gain  sum(ex_old^2 - ex_new^2)  and the trial error
sum(ex_new^2). The reference reads the whole residual vector back and
reduces on the host (levmar.cpp:185-198, trust_region.cpp:204-212); the
previous TPU path materialized new_ex [O,2] via an observation-stream
gather kernel and reduced it against the carried ex with an XLA pass
(core.residual.error_l2_diff). This kernel instead walks the dense
(camera x point-tile) grid once, evaluates the forward model at the
OLD and NEW parameters in the same tile visit, and accumulates the
factored per-cell difference (eo - en)(eo + en) — the conditioning of
error_l2_diff, exact in infinite precision — directly into a [2, 8, TL]
lane accumulator. No gather, no [O,2] residual materialization, and the
dense3 solvers no longer need to carry `ex` at all (OptState.ex rides
through the dense3 phases untouched; every solve/polish boundary
re-derives it via OptState.init).

Same tiling/chunking scheme as ops.linearize_dense (8-sublane vregs,
in-kernel fori_loop over G cameras per grid step). float32 only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psba_tpu.ops.linearize_dense import (
    G_MAX,
    TL,
    _cell_model,
    _interpret,
    _pad_p,
    _smem_spec,
)


def _cell_residual(kq_ref, camv_ref, c, x1, x2, x3, obsu, obsv, vmask,
                   clamp):
    """Forward model of one camera against a point tile: returns the
    masked residual (exu, exv) [8, TL]. Same math as the residual part
    of ops.linearize_dense._dense_kernel (kern_compute_exQT parity,
    CL_files/compute_exQT.cl)."""
    fu, u0, v0 = kq_ref[0, c], kq_ref[1, c], kq_ref[2, c]
    ar, sk = kq_ref[3, c], kq_ref[4, c]
    a, b, cc, d = kq_ref[5, c], kq_ref[6, c], kq_ref[7, c], kq_ref[8, c]
    v1, v2, v3 = camv_ref[0, c], camv_ref[1, c], camv_ref[2, c]
    t1, t2, t3 = camv_ref[3, c], camv_ref[4, c], camv_ref[5, c]

    s2 = 1.0 - v1 * v1 - v2 * v2 - v3 * v3
    if clamp:
        s2 = jnp.maximum(s2, 0.0)
    s = jnp.sqrt(s2)

    t01 = 2.0 * (cc * x3 - d * x2)
    t02 = 2.0 * (d * x1 - b * x3)
    t03 = 2.0 * (b * x2 - cc * x1)
    X01 = x1 + a * t01 + (cc * t03 - d * t02)
    X02 = x2 + a * t02 + (d * t01 - b * t03)
    X03 = x3 + a * t03 + (b * t02 - cc * t01)

    w1 = v2 * X03 - v3 * X02
    w2 = v3 * X01 - v1 * X03
    w3 = v1 * X02 - v2 * X01

    p1 = X01 + 2.0 * (s * w1 + v2 * w3 - v3 * w2) + t1
    p2 = X02 + 2.0 * (s * w2 + v3 * w1 - v1 * w3) + t2
    p3 = X03 + 2.0 * (s * w3 + v1 * w2 - v2 * w1) + t3

    # masked cells can sit at p3 ~ 0; keep the division finite
    p3 = jnp.where(vmask > 0.0, p3, jnp.float32(1.0))
    iz = 1.0 / p3
    pu = (fu * p1 + sk * p2 + u0 * p3) * iz
    pv = (fu * ar * p2 + v0 * p3) * iz
    return (obsu - pu) * vmask, (obsv - pv) * vmask


def _gain_kernel(*refs, G, clamp, has_mask):
    it = iter(refs)
    kq_ref, co_ref, cn_ref = next(it), next(it), next(it)
    mask_ref = next(it) if has_mask else None
    Xo_ref, Xn_ref = next(it), next(it)
    obsu_ref, obsv_ref, valid_ref, acc_ref = (
        next(it), next(it), next(it), next(it)
    )
    p_id = pl.program_id(0)
    cg = pl.program_id(1)

    # the [2, 8, TL] accumulator block is const-indexed: every grid step
    # visits it, the very first one initializes it
    @pl.when((p_id == 0) & (cg == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xo1, xo2, xo3 = Xo_ref[0], Xo_ref[1], Xo_ref[2]    # [8, TL]
    xn1, xn2, xn3 = Xn_ref[0], Xn_ref[1], Xn_ref[2]

    def body(g, _):
        c = cg * G + g

        def compute():
            vmask = valid_ref[pl.ds(g, 1), :, :][0]
            obsu = obsu_ref[pl.ds(g, 1), :, :][0]
            obsv = obsv_ref[pl.ds(g, 1), :, :][0]
            eou, eov = _cell_residual(
                kq_ref, co_ref, c, xo1, xo2, xo3, obsu, obsv, vmask, clamp
            )
            enu, env = _cell_residual(
                kq_ref, cn_ref, c, xn1, xn2, xn3, obsu, obsv, vmask, clamp
            )
            # factored difference: exact in infinite precision,
            # conditioned for f32 near convergence (error_l2_diff)
            acc_ref[0] += (
                (eou - enu) * (eou + enu) + (eov - env) * (eov + env)
            )
            acc_ref[1] += enu * enu + env * env

        if mask_ref is None:
            compute()
        else:
            pl.when(mask_ref[c, p_id] > 0)(compute)
        return jnp.int32(0)

    # int32 bounds: see cholesky_pallas (x64 -> int64 induction var,
    # which Mosaic cannot lower)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("clamp",))
def gain_dense_pallas(K, q0, cams, pts, new_cams, new_pts,
                      obs_du, obs_dv, valid_d, clamp=False,
                      tile_mask=None):
    """Trial-step acceptance scalars on the dense (cam x point) grid.

    Returns (gain, new_l2):
      gain   = sum over observed cells of ex_old^2 - ex_new^2, factored
               per cell as (eo - en)(eo + en)
      new_l2 = sum over observed cells of ex_new^2
    """
    f32 = jnp.float32
    C, P = valid_d.shape
    step = 8 * TL
    Pp = ((P + step - 1) // step) * step
    n_pt = Pp // step
    G = min(C, G_MAX)
    n_cg = -(-C // G)
    G = -(-C // n_cg)
    Cp = n_cg * G

    kq = jnp.concatenate([K, q0], axis=1).astype(f32).T      # [9, C]
    co = cams.astype(f32).T                                  # [6, C]
    cn = new_cams.astype(f32).T
    if Cp != C:
        kq = jnp.pad(kq, ((0, 0), (0, Cp - C)))
        co = jnp.pad(co, ((0, 0), (0, Cp - C)))
        cn = jnp.pad(cn, ((0, 0), (0, Cp - C)))
    Xo = _pad_p(pts.astype(f32).T, Pp).reshape(3, 8, Pp // 8)
    Xn = _pad_p(new_pts.astype(f32).T, Pp).reshape(3, 8, Pp // 8)

    def _pad_rows(arr):
        out = _pad_p(arr.astype(f32), Pp)
        if Cp != C:
            out = jnp.pad(out, ((0, Cp - C), (0, 0)))
        return out.reshape(Cp, 8, Pp // 8)

    ou = _pad_rows(obs_du)
    ov = _pad_rows(obs_dv)
    vd = _pad_rows(valid_d)
    has_mask = tile_mask is not None
    if has_mask:
        mask = tile_mask.astype(jnp.int32)
        if Cp != C:
            mask = jnp.pad(mask, ((0, Cp - C), (0, 0)))

    x_spec = pl.BlockSpec(
        (3, 8, TL), lambda p, cg: (jnp.int32(0), jnp.int32(0), p),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (G, 8, TL), lambda p, cg: (cg, jnp.int32(0), p),
        memory_space=pltpu.VMEM,
    )
    acc_spec = pl.BlockSpec(
        (2, 8, TL),
        lambda p, cg: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        _smem_spec(kq.shape), _smem_spec(co.shape), _smem_spec(cn.shape)
    ]
    inputs = [kq, co, cn]
    if has_mask:
        in_specs.append(_smem_spec(mask.shape))
        inputs.append(mask)
    in_specs += [x_spec, x_spec, row_spec, row_spec, row_spec]
    inputs += [Xo, Xn, ou, ov, vd]
    acc = pl.pallas_call(
        functools.partial(
            _gain_kernel, G=G, clamp=clamp, has_mask=has_mask
        ),
        grid=(n_pt, n_cg),
        in_specs=in_specs,
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((2, 8, TL), f32),
        interpret=_interpret(),
    )(*inputs)

    return jnp.sum(acc[0]), jnp.sum(acc[1])


def _jgram_kernel(*refs, G, n, clamp, has_mask):
    it = iter(refs)
    kq_ref, camv_ref, dc_ref = next(it), next(it), next(it)
    mask_ref = next(it) if has_mask else None
    X_ref, dp_ref, valid_ref, acc_ref = (
        next(it), next(it), next(it), next(it)
    )
    p_id = pl.program_id(0)
    cg = pl.program_id(1)

    @pl.when((p_id == 0) & (cg == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x1, x2, x3 = X_ref[0], X_ref[1], X_ref[2]          # [8, TL]

    def body(g, _):
        c = cg * G + g

        def compute():
            vmask = valid_ref[pl.ds(g, 1), :, :][0]
            A, B, _exu, _exv = _cell_model(
                kq_ref, camv_ref, c, x1, x2, x3, vmask, clamp
            )
            # J x per row: sum_i A[r][i] dc[i] + sum_k B[r][k] dp[k]
            jx = []
            for a_ in range(n):
                rows = []
                for r in range(2):
                    acc = A[r][0] * dc_ref[a_ * 6, c]
                    for i in range(1, 6):
                        acc += A[r][i] * dc_ref[a_ * 6 + i, c]
                    for k in range(3):
                        acc += (
                            B[r][k] * dp_ref[pl.ds(a_ * 3 + k, 1), :, :][0]
                        )
                    rows.append(acc)
                jx.append(rows)
            # upper-triangle Gram entries, per-lane partials
            idx = 0
            for a_ in range(n):
                for b_ in range(a_, n):
                    acc_ref[idx] += (
                        jx[a_][0] * jx[b_][0] + jx[a_][1] * jx[b_][1]
                    )
                    idx += 1

        if mask_ref is None:
            compute()
        else:
            pl.when(mask_ref[c, p_id] > 0)(compute)
        return jnp.int32(0)

    # int32 bounds: see cholesky_pallas (x64 -> int64 induction var,
    # which Mosaic cannot lower)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("clamp",))
def jgram_dense_pallas(K, q0, cams, pts, valid_d, dirs_c, dirs_p,
                      clamp=False, tile_mask=None):
    """Gram matrix of J-applications on the dense grid: G[a, b] =
    <J x_a, J x_b> for direction vectors x = (dirs_c [n, C, 6] camera
    parts, dirs_p [n, 3, Pp] planar point parts), J the coeff-free
    reprojection jacobian at (cams, pts).

    Each cell evaluates the analytic jacobian (shared _cell_model) and
    accumulates the per-residual-row products — a SUM OF PRODUCTS OF
    SMALL TERMS, the same conditioning as the reference's explicit J p
    materialization (compute_Jmultiply + dot, trust_region.cpp:166-176).
    The block form x^T [[U,W],[W^T,V]] x is algebraically equal but
    catastrophically cancels in f32 when |J x| is small (the
    Gauss-Newton step): measured on 7camsvarK-f32, the block form
    parked TR at 1.05x the optimum that this form reaches.

    Returns G [n, n] (symmetric, coeff-free: multiply by 2 for the TR
    B = 2 J^T J scalars).
    """
    f32 = jnp.float32
    n = dirs_c.shape[0]
    C, P = valid_d.shape
    step = 8 * TL
    Pp = ((P + step - 1) // step) * step
    n_pt = Pp // step
    G = min(C, G_MAX)
    n_cg = -(-C // G)
    G = -(-C // n_cg)
    Cp = n_cg * G

    kq = jnp.concatenate([K, q0], axis=1).astype(f32).T
    camv = cams.astype(f32).T
    dc = dirs_c.astype(f32).transpose(0, 2, 1).reshape(6 * n, C)
    if Cp != C:
        kq = jnp.pad(kq, ((0, 0), (0, Cp - C)))
        camv = jnp.pad(camv, ((0, 0), (0, Cp - C)))
        dc = jnp.pad(dc, ((0, 0), (0, Cp - C)))
    Xp = _pad_p(pts.astype(f32).T, Pp).reshape(3, 8, Pp // 8)
    dp = _pad_p(
        dirs_p.astype(f32).reshape(3 * n, -1), Pp
    ).reshape(3 * n, 8, Pp // 8)
    vd = _pad_p(valid_d.astype(f32), Pp)
    if Cp != C:
        vd = jnp.pad(vd, ((0, Cp - C), (0, 0)))
    vd = vd.reshape(Cp, 8, Pp // 8)
    has_mask = tile_mask is not None
    if has_mask:
        mask = tile_mask.astype(jnp.int32)
        if Cp != C:
            mask = jnp.pad(mask, ((0, Cp - C), (0, 0)))

    npair = n * (n + 1) // 2
    x_spec = pl.BlockSpec(
        (3, 8, TL), lambda p, cg: (jnp.int32(0), jnp.int32(0), p),
        memory_space=pltpu.VMEM,
    )
    dp_spec = pl.BlockSpec(
        (3 * n, 8, TL), lambda p, cg: (jnp.int32(0), jnp.int32(0), p),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (G, 8, TL), lambda p, cg: (cg, jnp.int32(0), p),
        memory_space=pltpu.VMEM,
    )
    acc_spec = pl.BlockSpec(
        (npair, 8, TL),
        lambda p, cg: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        _smem_spec(kq.shape), _smem_spec(camv.shape), _smem_spec(dc.shape)
    ]
    inputs = [kq, camv, dc]
    if has_mask:
        in_specs.append(_smem_spec(mask.shape))
        inputs.append(mask)
    in_specs += [x_spec, dp_spec, row_spec]
    inputs += [Xp, dp, vd]
    acc = pl.pallas_call(
        functools.partial(
            _jgram_kernel, G=G, n=n, clamp=clamp, has_mask=has_mask
        ),
        grid=(n_pt, n_cg),
        in_specs=in_specs,
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((npair, 8, TL), f32),
        interpret=_interpret(),
    )(*inputs)

    tri = jnp.sum(acc, axis=(1, 2))                     # [npair]
    Gm = jnp.zeros((n, n), f32)
    iu, ju = np.triu_indices(n)
    Gm = Gm.at[iu, ju].set(tri)
    Gm = Gm.at[ju, iu].set(tri)
    return Gm
