"""Benchmark driver — prints ONE JSON line.

Metric: device wall-clock per LM iteration on Trafalgar-21-11315 (the
reference's active dataset, PSBA/main.cpp:61-62), f32 fast path. Each
iteration does the full pipeline: jacobian + U/V/W/g assembly + Schur
reduction + Cholesky solve + trial step (SURVEY.md §3.2). Early stop is
disabled so every run does identical work.

Methodology (round 5 — see benchmarks/measure.py): the per-iteration
time is the MARGINAL cost (t(K2 repeats) - t(K1 repeats)) /
((K2-K1) * n_iters), where one *dispatch* runs K identical full
n-iteration solves inside a device-side fori_loop.  This isolates
device compute from the fixed per-dispatch cost (host->device RPC
latency through the tunneled TPU, ~30 ms) AND lets the window grow past
the tunnel's timer-jitter floor (~16 ms observed) regardless of the
dataset's f32 convergence horizon (~31 stop-disabled iterations here).
Median-of-7 per point; K2 escalates until the window clears 10x the
observed jitter; if it cannot, `value` is null rather than noise
(round-4 regression guard: a fixed 9 ms window once published a
negative per-iteration time).

`vs_baseline` compares against bench_baseline.json — the same marginal
measurement of this framework's first end-to-end TPU solver (commit
ade29da), re-measured with this same repeats method. The OpenCL
reference publishes no numbers and only builds on Windows/MSVC
(BASELINE.md). >1.0 means faster than the recorded baseline.
"""

import json
import os
import sys

N_ITERS = 12  # per repeat; well inside trafalgar21's f32 horizon (~31)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.measure import (
        enable_compile_cache,
        lm_repeat_runner,
        make_timed_call,
        marginal_iter_ms,
    )

    enable_compile_cache()
    from psba_tpu.io import load_problem
    from psba_tpu.solvers.lm import lm_run
    from psba_tpu.solvers.types import (
        OptState,
        ProblemArrays,
        SolverConfig,
        resolve_damping,
    )

    data = "/root/reference/data"
    prob = load_problem(
        f"{data}/Trafalgar-21-11315-cams.txt",
        f"{data}/Trafalgar-21-11315-pts.txt",
    )
    # the same tile-major point clustering hybrid.solve applies on dense
    # problems (enables the kernels' (camera, tile) occupancy skip)
    prob, _ = prob.with_tile_point_order()

    pa = ProblemArrays.from_problem(prob, dtype=jnp.float32)
    cams = jnp.asarray(prob.cams, jnp.float32)
    pts = jnp.asarray(prob.pts, jnp.float32)
    state0 = OptState.init(pa, cams, pts)

    # no early stop / no LM->TR switch: fixed work per run; damping
    # resolved exactly as the default solve() would (trafalgar21's diag
    # ratio 4.2e8 < 8.4e9 resolves to additive — reference parity)
    cfg = SolverConfig(
        max_iters=N_ITERS, stop_thresh=1e-30, lm_switch_count=10_000
    )
    cfg = resolve_damping(cfg, pa, cams, pts)._replace(
        lm_switch_count=10_000
    )

    run_repeat = lm_repeat_runner(lm_run)
    # sanity: every repeat must complete exactly N_ITERS iterations
    acc, itno = run_repeat(
        pa, state0, cfg, jnp.int32(N_ITERS), jnp.int32(3)
    )
    final_l2 = float(acc) / 3.0
    assert int(itno) == 3 * N_ITERS, (int(itno), float(acc))

    call = make_timed_call(run_repeat, pa, state0, cfg, N_ITERS)
    lm_iter_ms, diag = marginal_iter_ms(call, N_ITERS)
    amortized_ms = diag["t_k2_ms"] / (diag["k2"] * N_ITERS)

    extra = {
        "n_obs": prob.n_obs,
        "device": str(jax.devices()[0]),
        "dtype": "float32",
        "amortized_iter_ms_incl_dispatch": round(amortized_ms, 3),
        "final_l2_after_12it": final_l2,
        "timing": diag,
    }

    if lm_iter_ms is None:
        # sub-floor window even at K_max: refuse to publish noise
        print(json.dumps({
            "metric": "lm_iter_ms_trafalgar21",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "extra": extra,
        }))
        return 0

    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("lm_iter_ms"):
            vs_baseline = base["lm_iter_ms"] / lm_iter_ms

    # speed-of-light accounting (BASELINE.md: stages measured vs roofline)
    from psba_tpu.utils.roofline import summarize

    extra["observations_per_s"] = int(prob.n_obs / (lm_iter_ms * 1e-3))
    extra.update(summarize(prob.n_cams, prob.n_pts, prob.n_obs, lm_iter_ms))

    print(json.dumps({
        "metric": "lm_iter_ms_trafalgar21",
        "value": round(lm_iter_ms, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 3),
        "extra": extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
