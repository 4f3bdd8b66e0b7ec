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
latency, ~470 ns/column of cross-lane scalar round-trips): columns are
eliminated in panels of PANEL=16 with ZERO cross-lane reductions per
column. One fori step loads the PANEL in-flight full-width rows of the
symmetric working matrix with the forward-solve rhs r appended as an
extra row (panel9 [PANEL+1, Np]); ONE exact one-hot MXU product
extracts the whole diagonal block + rhs values into a
[PANEL+1, PANEL] register (D9[m, b] = panel9[m, j0+b]); the
factorization recurrence
    c_k   = inv_k * (panel9_k - sum_{k'<k} lb[k,k'] * c_k')
    r_out = panel9_r - sum_k y_k * c_k
is linear in the original panel rows, so the whole panel's L^T rows and
updated rhs are produced by ONE MXU product W @ panel9, where the
[PANEL+1, PANEL+1] transform W is built column-by-column from D9's
register-resident factorization (tiny static-slice ops only — the
coefficient column of step k is simultaneously lb[m,k] for rows m>k
and y_k for the rhs row). The trailing update is ONE rank-PANEL MXU
product M -= C^T C per panel. The backward pass is blocked the same
way: per panel, three lane reductions (out-of-block dots Lr[j,:].x, y
and dinv at the block lanes), one MXU product for the in-block coupling
resT[a,b] = L^T[j0+a, j0+b], then PANEL unrolled register steps — no
per-column MXU transpose, no materialized identity operand, no final L
transpose. Sequential dependencies are unchanged (Cholesky columns are
inherently ordered); the critical path is now the per-column chain of
~10 tiny register ops (rsqrt + slice + FMA). Measured on v5e:
0.060 (r4) -> 0.041 ms at n=126, 0.29 -> 0.22 ms at n=512; accuracy
IMPROVES to ~2e-7 rel residual (the register-block arithmetic is exact
f32 and all MXU products run Precision.HIGHEST — Mosaic's default dot
precision is bf16 passes, which cost 3 decimal digits here, and HIGH is
not lowerable).

Tried and rejected (round 5): restricting the trailing update to the
trailing row panels via an inner dynamic-bound fori_loop of per-panel
[PANEL, Np] read-modify-writes — although it cuts the O(Np^3/PANEL)
VMEM traffic roughly in half on paper, Mosaic pipelines the single
full-matrix M -= C^T C far better than many small dynamic-sliced
updates (measured: n=126 41 -> 47 us, n=558 0.30 -> 0.47 ms, n=1024
0.9 -> 1.44 ms). The full-matrix form stands.

Failure contract matches kern_cholesky's ret flag (SPD_inv.cl:66-75 uses
isfinite checks): ok accumulates (d > 0 & finite) over real columns; on
failure x contains garbage and the caller escalates damping exactly as it
does for the XLA path (core.linalg.spd_solve).

Padding: S is embedded in an [Np, Np] identity (Np = next multiple of
128), so padded columns factor as d = 1 and contribute nothing (their
forward/backward scalars are exactly 0); the panel sweep therefore runs
over ceil(n/PANEL)*PANEL columns without a tail case. b pads with
zeros. f32 only (Mosaic); the f64/CPU path stays on XLA.

Naming note: the *9 suffixes (panel9/D9/psub9/acc99/lane9) are
historical from the PANEL=8 era and mean "PANEL+1 rows" (the appended
forward-solve rhs row); at PANEL=16 the actual shapes are
panel9 [17, Np], D9 [17, 16], W/acc99 [17, 17].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget at the cap, all [Np, Np] f32 buffers counted: S input block
# + M working copy + Lr rows-of-L^T = 3 * Np^2 * 4 B. Np=1024 -> 12 MB,
# inside one v5e core's ~16 MB with room for the [PANEL+1, Np] panel and
# [1, Np] vectors (the round-4 version additionally materialized an
# [Np, Np] identity MXU operand; this one does not). Verified to compile
# and run on TPU v5e at n=1024 (tests/test_linalg.py::test_pallas_cap_shape
# covers the shape; the TPU run is in PROFILE_r05.json's methodology).
MAX_N = 1024
PANEL = 16


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chol_kernel(S_ref, b_ref, x_ref, ok_ref, M_ref, Lr_ref, *, n, Np):
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    psub = jax.lax.broadcasted_iota(jnp.int32, (PANEL, 1), 0)
    psub9 = jax.lax.broadcasted_iota(jnp.int32, (PANEL + 1, 1), 0)

    M_ref[...] = S_ref[...]
    n_panels = (n + PANEL - 1) // PANEL  # padded cols factor harmlessly

    bidx = jax.lax.broadcasted_iota(jnp.int32, (1, PANEL), 1)

    def fwd_body(p, carry):
        r, y, dinv, okf = carry
        j0 = p * PANEL
        # panel9 = the PANEL in-flight full-width rows of symmetric M
        # with the forward-solve rhs r appended as an extra row
        panel9 = jnp.concatenate(
            [M_ref[pl.ds(j0, PANEL), :], r], axis=0
        )                                              # [PANEL+1, Np]
        # ONE exact MXU product (one-hot columns, Precision.HIGHEST)
        # extracts the whole PANELxPANEL diagonal block + the rhs values
        # into a [PANEL+1, PANEL] register: D9[m, b] = panel9[m, j0+b].
        # The within-panel factorization then runs entirely on static
        # register slices — ZERO cross-lane reductions per column (the
        # round-4/round-5a versions spent ~470/~315 ns per column on
        # them; this is the latency this kernel lives or dies by).
        tile8 = (lane == (j0 + psub)).astype(f32)      # [PANEL, Np]
        D9 = jax.lax.dot_general(
            panel9, tile8, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )                                              # [PANEL+1, PANEL]
        # The per-column full-width updates are deferred into ONE MXU
        # product: the factorization recurrence
        #   c_k   = inv_k * (panel9_k - sum_{k'<k} lb[k,k'] * c_k')
        #   r_out = panel9_rhs - sum_k y_k * c_k
        # is linear in the original panel rows, so [c_0..c_{P-1}, r_out]
        # = W @ panel9 for a [PANEL+1, PANEL+1] transform W built
        # entirely from the register block's factorization (the
        # coefficient column coef9 of column k is simultaneously
        # lb[m, k] for rows m > k and y_k for the rhs row — one
        # accumulator outer product per column threads it into every
        # future W row).
        wrows = []
        acc99 = jnp.zeros((PANEL + 1, PANEL + 1), f32)
        yv = jnp.zeros((PANEL, 1), f32)
        dv = jnp.zeros((PANEL, 1), f32)
        lane9 = jax.lax.broadcasted_iota(jnp.int32, (1, PANEL + 1), 1)
        sub8 = psub
        for k in range(PANEL):
            d = D9[k:k + 1, k:k + 1]                   # [1, 1]
            # f32-typed branches: bare Python floats here would become
            # weak float64 under jax_enable_x64 and crash Mosaic
            okf = jnp.minimum(
                okf,
                jnp.where(
                    (d > 0.0) & jnp.isfinite(d),
                    jnp.float32(1.0), jnp.float32(0.0),
                ),
            )
            inv_sq = jax.lax.rsqrt(d)                  # [1, 1]
            ek = (lane9 == k).astype(f32)              # [1, PANEL+1]
            wk = (ek - acc99[k:k + 1, :]) * inv_sq     # [1, PANEL+1]
            wrows.append(wk)
            mask9 = ((psub9 > k) | (psub9 == PANEL)).astype(f32)
            coef9 = D9[:, k:k + 1] * inv_sq * mask9    # [PANEL+1, 1]
            acc99 = acc99 + coef9 * wk
            # keep the register block in sync (in-block lanes only)
            crow = jnp.where(
                bidx >= k, D9[k:k + 1, :] * inv_sq, jnp.float32(0.0)
            )
            D9 = D9 - coef9 * crow
            yv = yv + jnp.where(
                sub8 == k, coef9[PANEL:PANEL + 1, :], jnp.float32(0.0)
            )
            dv = dv + jnp.where(sub8 == k, inv_sq, jnp.float32(0.0))
        wrows.append(
            (lane9 == PANEL).astype(f32) - acc99[PANEL:PANEL + 1, :]
        )
        W = jnp.concatenate(wrows, axis=0)             # [PANEL+1, PANEL+1]
        CW = jax.lax.dot_general(
            W, panel9, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )                                              # [PANEL+1, Np]
        # c_k is exactly zero below its own column (elimination); mask
        # the f32 residue the one-shot matmul leaves there
        C = jnp.where(lane >= (j0 + psub), CW[:PANEL, :], jnp.float32(0.0))
        r = CW[PANEL:PANEL + 1, :]
        # batch the y/dinv lane scatters: one sublane reduction each
        y = y + jnp.sum(yv * tile8, axis=0, keepdims=True)
        dinv = dinv + jnp.sum(dv * tile8, axis=0, keepdims=True)
        Lr_ref[pl.ds(j0, PANEL), :] = C                # rows of L^T
        # one rank-PANEL MXU trailing update: M -= C^T C
        M_ref[...] = M_ref[...] - jax.lax.dot_general(
            C, C, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return r, y, dinv, okf

    r0 = b_ref[...]
    zero = jnp.zeros((1, Np), f32)
    one1 = jnp.ones((1, 1), f32)
    # int32 bounds: under jax_enable_x64 a Python-int bound would make
    # the induction variable int64, which Mosaic cannot lower (its
    # convert-element-type rule recurses infinitely)
    _, y, dinv, okf = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_panels), fwd_body,
        (r0, zero, zero, one1)
    )

    def bwd_body(i, x):
        p = n_panels - 1 - i
        j0 = p * PANEL
        Lblk = Lr_ref[pl.ds(j0, PANEL), :]             # [PANEL, Np]
        # batch the block's cross-lane work: x holds solved lanes >=
        # j0+PANEL only, so `dots` carries the out-of-block back-
        # substitution sums; tile8 (one-hot rows) gathers y/dinv at the
        # block's lanes; resT[a, b] = L^T[j0+a, j0+b] is the in-block
        # coupling, extracted with one MXU product
        tile8 = (lane == (j0 + psub)).astype(f32)      # [PANEL, Np]
        dots = jnp.sum(Lblk * x, axis=1, keepdims=True)
        yv = jnp.sum(tile8 * y, axis=1, keepdims=True)
        dv = jnp.sum(tile8 * dinv, axis=1, keepdims=True)
        resT = jax.lax.dot_general(
            Lblk, tile8, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )                                              # [PANEL, PANEL]
        rem = yv - dots                                # [PANEL, 1]
        xv = jnp.zeros((PANEL, 1), f32)
        for k in reversed(range(PANEL)):
            xj = rem[k:k + 1, :] * dv[k:k + 1, :]      # [1, 1]
            # rows a < k couple to x_j via U[j0+a, j0+k] = resT[:, k]
            rem = rem - jnp.where(
                psub < k, resT[:, k:k + 1], jnp.float32(0.0)
            ) * xj
            xv = xv + jnp.where(psub == k, xj, jnp.float32(0.0))
        # scatter the block's solutions into the lane vector
        return x + jnp.sum(xv * tile8, axis=0, keepdims=True)

    x = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_panels), bwd_body, zero)
    x_ref[...] = x
    ok_ref[0, 0] = (okf[0, 0] > 0.0).astype(jnp.int32)


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
