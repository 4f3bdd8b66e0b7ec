"""Single-kernel Pallas Cholesky factor + solve for the reduced system.

TPU-native replacement for the reference's SPD pipeline
(CL_files/SPD_inv.cl:20-239 + cl_spdinv.cpp:18-40): the reference chains
self-enqueueing 3x3-blocked kernels (kern_cholesky / _s2) so control stays
on the device; XLA's equivalent (lax.linalg.cholesky + two triangular
solves) lowers to a while-loop of O(6C) *separate* device ops, whose
per-op sequencing overhead — not flops or bytes — was the measured limiter
of the whole LM iteration (BENCH_r03: 0.891 ms measured vs 0.185 ms
roofline, `bound: latency`, seq_steps 126). This kernel runs the entire
factor-forward-backward chain as TWO fori_loops inside ONE Pallas kernel.

Round-5 blocking (PROFILE_r05: the round-4 column-at-a-time version
measured 0.060 ms for n=126 vs a 0.0002 ms roofline — pure per-step
latency): columns are eliminated in panels of PANEL=8. One fori step now
factors 8 columns on an in-register [8, Np] panel (the full-width rows
j..j+7 of the symmetric working matrix), applies ONE rank-8 MXU trailing
update M -= C^T C (instead of 8 full-matrix rank-1 passes), and the
backward pass consumes L^T rows directly as dot products (x_j = (y_j -
Lr[j,:]·x) * dinv_j) — no per-column MXU transpose, no materialized
identity operand, no final L transpose. Sequential dependencies are
unchanged (Cholesky columns are inherently ordered); what drops ~8x is
the loop-step count and the full-matrix VPU traffic.

Algorithm (all row-oriented — column extraction is a strided access on
the TPU's (sublane, lane) layout, so the working matrix is kept symmetric
and column j is read as row j):

  factor+forward, one fori step per 8-column panel:
    panel = M[j0:j0+8, :]             (full-width rows of symmetric M)
    for k in 0..7 (unrolled):
      j    = j0 + k
      d    = panel[k, j]              (mask+reduce on panel row k)
      c_k  = panel[k, :] * rsqrt(d)   (= column j of L, as a row)
      panel -= cvals * c_k            (cvals[m] = c_k[j0+m]: the rank-1
                                       restricted to the in-flight rows)
      y_j  = r[j] * rsqrt(d); r -= y_j * c_k     (forward solve fused)
    Lr[j0:j0+8, :] = C                (rows j of Lr = column j of L = row
                                       j of L^T)
    M -= C^T @ C                      (one [Np,8]x[8,Np] MXU product)

  backward, one fori step per panel, j = n-1..0 inside:
    x_j = (y_j - Lr[j, :] . x) * dinv_j     (x holds lanes > j only, so
                                       the dot needs no mask; L^T row j
                                       IS the coefficient row of x_j)

Failure contract matches kern_cholesky's ret flag (SPD_inv.cl:66-75 uses
isfinite checks): ok accumulates (d > 0 & finite) over real columns; on
failure x contains garbage and the caller escalates damping exactly as it
does for the XLA path (core.linalg.spd_solve).

Padding: S is embedded in an [Np, Np] identity (Np = next multiple of
128), so padded columns factor as d = 1 and contribute nothing (their
forward/backward scalars are exactly 0); the panel sweep therefore runs
over ceil(n/8)*8 columns without a tail case. b pads with zeros. f32
only (Mosaic); the f64/CPU path stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget at the cap, all [Np, Np] f32 buffers counted: S input block
# + M working copy + Lr rows-of-L^T = 3 * Np^2 * 4 B. Np=1024 -> 12 MB,
# inside one v5e core's ~16 MB with room for the [8, Np] panel and [1, Np]
# vectors (the round-4 version additionally materialized an [Np, Np]
# identity MXU operand; this one does not). Verified to compile and run
# on TPU v5e at n=1024 (tests/test_linalg.py::test_pallas_cap_shape
# covers the shape; the TPU run is in PROFILE_r05.json's methodology).
MAX_N = 1024
PANEL = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chol_kernel(S_ref, b_ref, x_ref, ok_ref, M_ref, Lr_ref, *, n, Np):
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    psub = jax.lax.broadcasted_iota(jnp.int32, (PANEL, 1), 0)

    M_ref[...] = S_ref[...]
    n_panels = (n + PANEL - 1) // PANEL  # padded cols factor harmlessly

    def fwd_body(p, carry):
        r, y, dinv, ok = carry
        j0 = p * PANEL
        panel = M_ref[pl.ds(j0, PANEL), :]             # [PANEL, Np]
        crows = []
        for k in range(PANEL):
            j = j0 + k
            onehot = (lane == j).astype(f32)           # [1, Np]
            row = panel[k:k + 1, :]
            d = jnp.sum(row * onehot)
            ok = ok & (d > 0.0) & jnp.isfinite(d)
            inv_sq = jax.lax.rsqrt(d)
            c = jnp.where(lane >= j, row * inv_sq, 0.0)  # col j of L
            # restrict the rank-1 update to the in-flight panel rows:
            # cvals[m] = c[j0 + m] (rows m <= k are already factored and
            # see a zero coefficient, matching the full-matrix update)
            cvals = jnp.sum(
                panel * (onehot * inv_sq) * (psub > k).astype(f32),
                axis=1, keepdims=True,
            )                                          # [PANEL, 1]
            panel = panel - cvals * c
            crows.append(c)
            # forward substitution on the fly: y_j = r_j / L_jj
            yj = jnp.sum(r * onehot) * inv_sq
            r = r - yj * c
            y = y + yj * onehot
            dinv = dinv + inv_sq * onehot
        C = jnp.concatenate(crows, axis=0)             # [PANEL, Np]
        Lr_ref[pl.ds(j0, PANEL), :] = C                # rows of L^T
        # one rank-PANEL MXU trailing update: M -= C^T C
        M_ref[...] = M_ref[...] - jax.lax.dot_general(
            C, C, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        return r, y, dinv, ok

    r0 = b_ref[...]
    zero = jnp.zeros((1, Np), f32)
    _, y, dinv, ok = jax.lax.fori_loop(
        0, n_panels, fwd_body, (r0, zero, zero, jnp.bool_(True))
    )

    def bwd_body(i, x):
        p = n_panels - 1 - i
        j0 = p * PANEL
        Lblk = Lr_ref[pl.ds(j0, PANEL), :]             # [PANEL, Np]
        for k in reversed(range(PANEL)):
            j = j0 + k
            onehot = (lane == j).astype(f32)
            lrow = Lblk[k:k + 1, :]
            # x holds solved lanes > j only (zeros elsewhere), so the
            # back-substitution dot L^T[j, :] . x needs no mask
            xj = (jnp.sum(y * onehot) - jnp.sum(lrow * x)) * jnp.sum(
                dinv * onehot
            )
            x = x + xj * onehot
        return x

    x = jax.lax.fori_loop(0, n_panels, bwd_body, zero)
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
