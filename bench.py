"""Benchmark driver — prints ONE JSON line.

Metric: mean LM-iteration wall-clock on Trafalgar-21-11315 (the reference's
active dataset, PSBA/main.cpp:61-62) on the available accelerator, f32 fast
path, fixed 10-iteration LM run with early-stop disabled so every run does
identical work (jacobian + U/V/W/g assembly + Schur + Cholesky solve +
trial step per iteration, SURVEY.md §3.2).

`vs_baseline` compares against bench_baseline.json (the first recorded TPU
measurement of this framework — the OpenCL reference publishes no numbers
and only builds on Windows/MSVC, BASELINE.md). >1.0 means faster than the
recorded baseline.
"""

import json
import os
import sys
import time

import numpy as np


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

    n_iters = 10
    cfg = SolverConfig(
        max_iters=n_iters,
        stop_thresh=1e-30,       # no early stop: fixed work per run
        lm_switch_count=10_000,  # stay in LM
    )
    pa = ProblemArrays.from_problem(prob, dtype=jnp.float32)
    cams = jnp.asarray(prob.cams, jnp.float32)
    pts = jnp.asarray(prob.pts, jnp.float32)
    state0 = OptState.init(pa, cams, pts)

    run = jax.jit(lm_run, static_argnames=("cfg",))
    # compile + warmup
    out = run(pa, state0, cfg)
    out.ex_l2.block_until_ready()
    assert int(out.itno) == n_iters, f"expected {n_iters}, got {int(out.itno)}"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(pa, state0, cfg)
        out.ex_l2.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    lm_iter_ms = best / n_iters * 1e3
    obs_per_s = prob.n_obs * n_iters / best

    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("lm_iter_ms"):
            vs_baseline = base["lm_iter_ms"] / lm_iter_ms

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
            "final_l2_after_10it": float(out.ex_l2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
