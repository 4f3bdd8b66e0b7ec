"""Single-kernel Pallas Cholesky factor + solve for the reduced system.

TPU-native replacement for the reference's SPD pipeline
(CL_files/SPD_inv.cl:20-239 + cl_spdinv.cpp:18-40): the reference chains
self-enqueueing 3x3-blocked kernels (kern_cholesky / _s2) so control stays
on the device; XLA's equivalent (lax.linalg.cholesky + two triangular
solves) lowers to a while-loop of O(6C) *separate* device ops, whose
per-op sequencing overhead — not flops or bytes — is the measured limiter
of the whole LM iteration (BENCH_r03: 0.891 ms measured vs 0.185 ms
roofline, `bound: latency`, seq_steps 126). This kernel runs the entire
factor-forward-backward chain as TWO fori_loops inside ONE Pallas kernel:
the sequential dependency stays (Cholesky columns are inherently ordered)
but each step costs a handful of VPU/MXU instructions on VMEM-resident
data instead of a dispatched XLA op.

Algorithm (all row-oriented — column extraction is a strided access on
the TPU's (sublane, lane) layout, so the working matrix is kept symmetric
and column j is read as row j):

  factor+forward, j = 0..n-1 (one fori_loop):
    d    = M[j, j]                    (mask+reduce on row j)
    c    = M[j, :] * rsqrt(d)         (= column j of L, as a row)
    M   -= outer(c, c)                (symmetric rank-1; keeps M symmetric,
                                       zeroes row/col j)
    Lr[:, j] = c^T                    (L in row-major, for the backward
                                       pass; transpose via one [Np,Np]x
                                       [Np,1] MXU product with I)
    y_j  = r[j] * rsqrt(d);  r -= y_j * c      (forward solve fused)

  backward, j = n-1..0 (second fori_loop):
    x_j  = s[j] * rsqrt(d_j);  s -= x_j * Lr[j, :]   (row j of L carries
                                       L[j, i] = coefficient of x_j in
                                       equation i < j)

Failure contract matches kern_cholesky's ret flag (SPD_inv.cl:66-75 uses
isfinite checks): ok accumulates (d > 0 & finite) over real columns; on
failure x contains garbage and the caller escalates damping exactly as it
does for the XLA path (core.linalg.spd_solve).

Padding: S is embedded in an [Np, Np] identity (Np = next multiple of
128), so padded columns factor as d = 1 and contribute nothing; b pads
with zeros. f32 only (Mosaic); the f64/CPU path stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM footprint is 2 * Np^2 floats (working matrix + row-major L);
# 1024 -> 8 MB, comfortably inside one core's ~16 MB
MAX_N = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chol_kernel(S_ref, b_ref, x_ref, ok_ref, M_ref, Lr_ref, *, n, Np):
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

    M_ref[...] = S_ref[...]
    Lr_ref[...] = jnp.zeros((Np, Np), f32)   # rows >= n stay zero
    ident = (
        jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    ).astype(f32)

    def fwd_body(j, carry):
        r, y, dinv, ok = carry
        onehot = (lane == j).astype(f32)
        row = M_ref[pl.ds(j, 1), :]                    # [1, Np]
        d = jnp.sum(row * onehot)
        ok = ok & (d > 0.0) & jnp.isfinite(d)
        inv_sq = jax.lax.rsqrt(d)
        c = jnp.where(lane >= j, row * inv_sq, 0.0)    # col j of L, as row
        # c^T via one MXU product with I (a dynamic-column store/load is a
        # strided access Mosaic rejects; every column access in this
        # kernel is realized as row ops + this product)
        c_col = jax.lax.dot_general(
            ident, c, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )                                              # [Np, 1]
        M_ref[...] = M_ref[...] - c_col * c            # symmetric rank-1
        Lr_ref[pl.ds(j, 1), :] = c                     # row j of L^T
        # forward substitution on the fly: y_j = r_j / L_jj
        yj = jnp.sum(r * onehot) * inv_sq
        r = r - yj * c
        y = y + yj * onehot
        dinv = dinv + inv_sq * onehot
        return r, y, dinv, ok

    r0 = b_ref[...]
    zero = jnp.zeros((1, Np), f32)
    _, y, dinv, ok = jax.lax.fori_loop(
        0, n, fwd_body, (r0, zero, zero, jnp.bool_(True))
    )

    # Lr currently holds L^T (row j = column j of L); the backward pass
    # needs rows of L. One MXU product with I transposes it in place:
    # (I @ Lr^T)[a, b] = Lr[b, a].
    Lr_ref[...] = jax.lax.dot_general(
        ident, Lr_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )

    def bwd_body(i, carry):
        s, x = carry
        j = n - 1 - i
        onehot = (lane == j).astype(f32)
        xj = jnp.sum(s * onehot) * jnp.sum(dinv * onehot)
        lrow = Lr_ref[pl.ds(j, 1), :]                  # L[j, i] over i
        s = s - xj * jnp.where(lane < j, lrow, 0.0)
        x = x + xj * onehot
        return s, x

    _, x = jax.lax.fori_loop(0, n, bwd_body, (y, zero))
    x_ref[...] = x
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def spd_solve_pallas(S, b):
    """Solve S x = b (SPD, f32) in one fused Pallas kernel.

    Same contract as core.linalg.spd_solve: returns (x [n], ok); on
    ok=False x is zeroed. n <= MAX_N."""
    n = S.shape[0]
    assert n <= MAX_N, n
    Np = max(((n + 127) // 128) * 128, 128)
    f32 = jnp.float32
    Sp = jnp.eye(Np, dtype=f32).at[:n, :n].set(S.astype(f32))
    bp = jnp.zeros((1, Np), f32).at[0, :n].set(b.astype(f32))

    x, ok = pl.pallas_call(
        functools.partial(_chol_kernel, n=n, Np=Np),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Np), f32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Np, Np), f32),
            pltpu.VMEM((Np, Np), f32),
        ],
        interpret=_interpret(),
    )(Sp, bp)
    okb = ok[0, 0] > 0
    xs = x[0, :n].astype(S.dtype)
    return jnp.where(okb & jnp.isfinite(xs), xs, 0.0), okb
