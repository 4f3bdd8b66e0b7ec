"""Subtractive ablation of the dense3 LM iteration (Trafalgar-21, f32).

Swaps one pipeline stage at a time for a free/stub variant INSIDE lm_run
and re-measures the marginal per-iteration cost (bench.py method, one
compiled executable per variant via the dynamic iter_cap). Stubbed
variants converge WRONG — the numbers are timing attributions only.
The printed deltas attribute the measured-vs-roofline gap to stages in
their real fusion context, which isolated-stage timing cannot do.

    PYTHONPATH=. python benchmarks/ablate_dense3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ITERS = 12


def marginal_ms(pa, state0, cfg):
    """Repeats-marginal per-iteration time of the CURRENT (possibly
    monkeypatched) lm_run pipeline — benchmarks.measure method, so the
    window clears the tunnel jitter floor (the previous fixed 10-
    iteration window sat under it and attributed noise)."""
    from benchmarks.measure import (
        lm_repeat_runner,
        make_timed_call,
        marginal_iter_ms,
    )
    from psba_tpu.solvers.lm import lm_run

    # fresh wrapper per variant: jax.jit caches on the callable identity,
    # so re-jitting lm_run directly would silently reuse unpatched traces
    def _variant(pa, state, cfg, iter_cap=None):
        return lm_run(pa, state, cfg, iter_cap=iter_cap)

    run_repeat = lm_repeat_runner(_variant)
    acc, itno = run_repeat(
        pa, state0, cfg, jnp.int32(N_ITERS), jnp.int32(1)
    )
    l2 = float(acc)
    call = make_timed_call(run_repeat, pa, state0, cfg, N_ITERS)
    ms, _diag = marginal_iter_ms(call, N_ITERS, k_max=128)
    return (float("nan") if ms is None else ms), l2


def main():
    from psba_tpu.core import schur
    from psba_tpu.io import load_problem
    from psba_tpu.solvers import lm
    from psba_tpu.solvers.types import OptState, ProblemArrays, SolverConfig

    data = "/root/reference/data"
    prob = load_problem(
        f"{data}/Trafalgar-21-11315-cams.txt",
        f"{data}/Trafalgar-21-11315-pts.txt",
    )
    pa = ProblemArrays.from_problem(prob, dtype=jnp.float32)
    cams = jnp.asarray(prob.cams, jnp.float32)
    pts = jnp.asarray(prob.pts, jnp.float32)
    state0 = OptState.init(pa, cams, pts)
    C = prob.n_cams

    cfg = SolverConfig(
        max_iters=320, stop_thresh=1e-30, lm_switch_count=10_000,
        damping="additive",
    )

    results = {}

    def run(name):
        ms, l2 = marginal_ms(pa, state0, cfg)
        results[name] = (ms, l2)
        print(f"{name:30s} {ms:8.3f} ms/iter   l2={l2:.2f}", flush=True)

    # first measurement in a process runs slow (tunnel/device warm-up)
    marginal_ms(pa, state0, cfg)
    run("baseline")

    # --- S Cholesky factor+solve -> diagonal stub
    orig_spd = lm.spd_solve
    lm.spd_solve = lambda S, b: (b / jnp.diagonal(S), jnp.bool_(True))
    run("spd_solve->diag")
    lm.spd_solve = orig_spd

    # --- planar 3x3 inverse -> plain cofactor (no scale, no fallback)
    orig_inv3 = lm.inv3x3_planar3

    def inv_plain(Vp):
        a, b, c = Vp[0, 0], Vp[0, 1], Vp[0, 2]
        d, e, f = Vp[1, 1], Vp[1, 2], Vp[2, 2]
        co00 = d * f - e * e
        co01 = c * e - b * f
        co02 = b * e - c * d
        inv_det = 1.0 / (a * co00 + b * co01 + c * co02)
        co11 = a * f - c * c
        co12 = b * c - a * e
        co22 = a * d - b * b
        V = jnp.stack([
            jnp.stack([co00, co01, co02], 0),
            jnp.stack([co01, co11, co12], 0),
            jnp.stack([co02, co12, co22], 0),
        ], 0) * inv_det[None, None]
        return V, jnp.bool_(True)

    lm.inv3x3_planar3 = inv_plain
    run("inv3x3->plain-cofactor")
    lm.inv3x3_planar3 = orig_inv3

    # --- S assembly matmuls at DEFAULT (bf16) instead of HIGHEST (6-pass)
    orig_prec = schur._PREC
    schur._PREC = jax.lax.Precision.DEFAULT
    run("S-matmuls bf16")
    schur._PREC = orig_prec

    # --- dense gain kernel -> constant positive gain (always accept-ish)
    orig_gain = lm.gain_dense_pallas

    def gain_stub(K, q0, cams_, pts_, nc, npts, du, dv, vd, clamp=False,
                  tile_mask=None):
        one = jnp.asarray(1.0, jnp.float32)
        return one, one

    lm.gain_dense_pallas = gain_stub
    run("gain-kernel->stub")
    lm.gain_dense_pallas = orig_gain

    # --- dense-grid linearization (incl. fused U/ga) -> constant stub
    orig_dense = lm.linearize_dense_pallas

    def dense_stub(K, q0, cams_, pts_, du, dv, vd, clamp=False,
                   want_u=False, tile_mask=None):
        P = vd.shape[1]
        step = 2048
        Pp = ((P + step - 1) // step) * step
        z = jnp.zeros((6 * C, Pp), jnp.float32)
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32)[:, :, None], (3, 3, Pp)
        )
        out = (z, z, z, eye, jnp.zeros((3, Pp), jnp.float32), Pp)
        if want_u:
            U = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (C, 6, 6))
            out = out + (U, jnp.zeros((C, 6), jnp.float32))
        return out

    lm.linearize_dense_pallas = dense_stub
    run("dense-grid-lin->stub")
    lm.linearize_dense_pallas = orig_dense

    base = results["baseline"][0]
    print("\ndelta vs baseline (negative = stage cost):")
    for k, (ms, _) in results.items():
        if k != "baseline":
            print(f"{k:30s} {ms - base:+8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
