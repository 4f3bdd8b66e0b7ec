"""Multi-dataset benchmark: convergence + LM-iteration timing per config.

Covers the BASELINE.json config list (3cams -> 54camsvarKD -> Trafalgar-21
-> Ladybug-138 -> Venice-52 / Rome-93 / Dubrovnik-88). Complete datasets
report final error (parity surface); synthesized BAL-scale sets report
timing/throughput (SURVEY.md §2.4 — their original points files are not
bundled).

    python benchmarks/run_all.py [--f64] [--sets a,b,c] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_dataset(name, dtype, iters=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psba_tpu import datasets
    from psba_tpu.solvers import SolverConfig
    from psba_tpu.solvers.hybrid import solve
    from psba_tpu.solvers.lm import lm_run
    from psba_tpu.solvers.types import OptState, ProblemArrays

    prob = datasets.load(name)
    row = {
        "dataset": name, "cams": prob.n_cams, "pts": prob.n_pts,
        "obs": prob.n_obs, "complete": datasets.REGISTRY[name].complete,
    }

    # convergence (hybrid, dtype-adapted stops)
    res = solve(prob, dtype=dtype)
    row.update(
        initial_error=res.initial_error, final_error=res.final_error,
        rms_px=float(np.sqrt(res.final_l2 / prob.n_obs)),
        iterations=res.iterations, flag=res.flag_name,
        solve_wall_s=round(res.wall_s, 3),
    )

    # fixed-work LM iteration timing — MARGINAL method (bench.py): the
    # dynamic iter_cap reuses one compilation for both run lengths, so
    # (t(N2) - t(N1)) / (N2 - N1) isolates device compute from the fixed
    # per-dispatch tunnel latency
    n1, n2 = 2, iters
    cfg = SolverConfig.for_dtype(
        dtype, max_iters=n2, stop_thresh=1e-30, lm_switch_count=10_000
    )
    pa = ProblemArrays.from_problem(prob, dtype=dtype)
    cams = jnp.asarray(prob.cams, dtype)
    pts = jnp.asarray(prob.pts, dtype)
    state0 = OptState.init(pa, cams, pts)
    run = jax.jit(lm_run, static_argnames=("cfg",))

    def timed(cap):
        out = run(pa, state0, cfg, iter_cap=jnp.int32(cap))
        out.ex_l2.block_until_ready()
        assert int(out.itno) == cap
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(pa, state0, cfg, iter_cap=jnp.int32(cap))
            out.ex_l2.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = timed(n1), timed(n2)
    ms = (t2 - t1) / (n2 - n1) * 1e3
    row["lm_iter_ms"] = round(ms, 3)
    row["obs_per_s"] = int(prob.n_obs / (ms * 1e-3))
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--sets", default=(
        "7camsvarK,9camsvarK,54camsvarKD,trafalgar21,ladybug138,"
        "venice52,rome93,dubrovnik88"
    ))
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    rows = []
    for name in args.sets.split(","):
        print(f"--- {name}", file=sys.stderr, flush=True)
        try:
            rows.append(bench_dataset(name.strip(), dtype))
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:  # keep going; report the failure
            rows.append({"dataset": name, "error": repr(e)})
            print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"dtype": str(dtype.__name__), "rows": rows}, f,
                      indent=1)
    hdr = (f"{'dataset':<14s}{'C':>5s}{'P':>8s}{'O':>9s}"
           f"{'final_rms_px':>14s}{'it':>4s}{'ms/LM-iter':>12s}"
           f"{'obs/s':>12s}")
    print(hdr, file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"{r['dataset']:<14s} ERROR {r['error']}", file=sys.stderr)
            continue
        print(
            f"{r['dataset']:<14s}{r['cams']:>5d}{r['pts']:>8d}"
            f"{r['obs']:>9d}{r['rms_px']:>14.4f}{r['iterations']:>4d}"
            f"{r['lm_iter_ms']:>12.3f}{r['obs_per_s']:>12d}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
