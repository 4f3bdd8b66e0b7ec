"""Ablation timing of the real LM loop: attribute iteration time to
pipeline pieces by swapping one at a time INSIDE lm_run and re-measuring
the marginal per-iteration cost (same method as bench.py). Unlike
profile_stages.py (isolated stages), this keeps XLA's actual fusion
context, so differences are causally attributable.

    PYTHONPATH=. python benchmarks/ablate.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ITERS = 12


def marginal_ms(pa, state0, cfg_for):
    """Repeats-marginal per-iteration time of the CURRENT (possibly
    monkeypatched) lm_run pipeline — benchmarks.measure method, so the
    window clears the tunnel jitter floor (the previous fixed
    12-vs-2-iteration window sat under it)."""
    from benchmarks.measure import (
        lm_repeat_runner,
        make_timed_call,
        marginal_iter_ms,
    )
    from psba_tpu.solvers.lm import lm_run

    # a fresh wrapper function per variant: jax.jit caches traces on the
    # identity of the wrapped callable, so re-jitting lm_run directly would
    # silently reuse the unpatched trace
    def _variant(pa, state, cfg, iter_cap=None):
        return lm_run(pa, state, cfg, iter_cap=iter_cap)

    run_repeat = lm_repeat_runner(_variant)
    cfg = cfg_for(320)
    acc, _ = run_repeat(
        pa, state0, cfg, jnp.int32(N_ITERS), jnp.int32(1)
    )
    l2 = float(acc)
    call = make_timed_call(run_repeat, pa, state0, cfg, N_ITERS)
    ms, _diag = marginal_iter_ms(call, N_ITERS, k_max=128)
    return (float("nan") if ms is None else ms), l2


def main():
    from psba_tpu.core import linalg, schur
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

    def cfg_for(n):
        return SolverConfig(
            max_iters=n, stop_thresh=1e-30, lm_switch_count=10_000,
            damping="additive",
        )

    results = {}

    def run(name):
        ms, l2 = marginal_ms(pa, state0, cfg_for)
        results[name] = (ms, l2)
        print(f"{name:28s} {ms:8.3f} ms/iter   l2={l2:.2f}", flush=True)

    # the first measurement in a process runs ~2.5x slow (tunnel/device
    # warm-up); burn it before recording anything
    marginal_ms(pa, state0, cfg_for)
    run("baseline")

    # --- S matmul precision
    orig_prec = schur._PREC
    for prec, label in [
        (jax.lax.Precision.HIGH, "prec=HIGH(3pass)"),
        (jax.lax.Precision.DEFAULT, "prec=DEFAULT(bf16)"),
    ]:
        schur._PREC = prec
        run(label)
    schur._PREC = orig_prec

    # --- stub the S Cholesky solve (diagonal preconditioner only) to bound
    # the sequential-factorization cost; CONVERGENCE IS WRONG, timing only
    orig_spd = lm.spd_solve

    def diag_solve(S, b):
        x = b / jnp.diagonal(S)
        return x, jnp.bool_(True)

    lm.spd_solve = diag_solve
    run("spd_solve->diag stub")
    lm.spd_solve = orig_spd

    # --- skip the pivoted-determinant fallback in inv3x3
    orig_inv = lm.inv3x3

    def inv_plain(V):
        a, b_, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
        d, e, f = V[..., 1, 1], V[..., 1, 2], V[..., 2, 2]
        co00 = d * f - e * e
        co01 = c * e - b_ * f
        co02 = b_ * e - c * d
        det = a * co00 + b_ * co01 + c * co02
        inv_det = 1.0 / det
        co11 = a * f - c * c
        co12 = b_ * c - a * e
        co22 = a * d - b_ * b_
        row0 = jnp.stack([co00, co01, co02], -1)
        row1 = jnp.stack([co01, co11, co12], -1)
        row2 = jnp.stack([co02, co12, co22], -1)
        Vinv = jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]
        return Vinv, jnp.bool_(True)

    lm.inv3x3 = inv_plain
    run("inv3x3 no-fallback")
    lm.inv3x3 = orig_inv

    # --- combined: HIGH precision + no-fallback inv3x3
    schur._PREC = jax.lax.Precision.HIGH
    lm.inv3x3 = inv_plain
    run("HIGH + inv-nofallback")
    schur._PREC = orig_prec
    lm.inv3x3 = orig_inv

    base = results["baseline"][0]
    print("\ndelta vs baseline:")
    for k, (ms, _) in results.items():
        print(f"{k:28s} {ms - base:+8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
