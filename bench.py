"""Benchmark driver — prints ONE JSON line.

Metric: device wall-clock per LM iteration on Trafalgar-21-11315 (the
reference's active dataset, PSBA/main.cpp:61-62), f32 fast path. Each
iteration does the full pipeline: jacobian + U/V/W/g assembly + Schur
reduction + Cholesky solve + trial step (SURVEY.md §3.2). Early stop is
disabled so every run does identical work.

Methodology: the per-iteration time is the MARGINAL cost
(t(N2) - t(N1)) / (N2 - N1) between two fixed-iteration runs of the same
jitted solver. This isolates device compute from the fixed per-dispatch
cost (host->device RPC latency, which through a tunneled TPU is ~30 ms —
an environment artifact, not solver time). The fixed-overhead-amortized
number is reported in `extra` for reference.

`vs_baseline` compares against bench_baseline.json — the same marginal
measurement of this framework's first end-to-end TPU solver (commit
ade29da), re-measured with this exact script's method. The OpenCL
reference publishes no numbers and only builds on Windows/MSVC
(BASELINE.md). >1.0 means faster than the recorded baseline.
"""

import json
import os
import sys
import time

N1, N2 = 2, 12
REPS = 5


def _timed_run(run, pa, state0, cfg):
    out = run(pa, state0, cfg)  # compile + warm
    assert int(out.itno) == cfg.max_iters
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(pa, state0, cfg)
        _sync = float(out.ex_l2)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp

    from psba_tpu.io import load_problem
    from psba_tpu.solvers.lm import lm_run
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

    run = jax.jit(lm_run, static_argnames=("cfg",))

    def cfg_for(n):
        # no early stop / no LM->TR switch: fixed work per run
        return SolverConfig(
            max_iters=n, stop_thresh=1e-30, lm_switch_count=10_000
        )

    t1, _ = _timed_run(run, pa, state0, cfg_for(N1))
    t2, out = _timed_run(run, pa, state0, cfg_for(N2))
    lm_iter_ms = (t2 - t1) / (N2 - N1) * 1e3
    obs_per_s = prob.n_obs / (lm_iter_ms * 1e-3)
    amortized_ms = t2 / N2 * 1e3

    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("lm_iter_ms"):
            vs_baseline = base["lm_iter_ms"] / lm_iter_ms

    # speed-of-light accounting (BASELINE.md: stages measured vs roofline)
    from psba_tpu.utils.roofline import summarize

    roof = summarize(
        prob.n_cams, prob.n_pts, prob.n_obs, lm_iter_ms
    )

    print(json.dumps({
        "metric": "lm_iter_ms_trafalgar21",
        "value": round(lm_iter_ms, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 3),
        "extra": {
            "observations_per_s": int(obs_per_s),
            "n_obs": prob.n_obs,
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "amortized_iter_ms_incl_dispatch": round(amortized_ms, 3),
            "final_l2_after_12it": float(out.ex_l2),
            **roof,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
