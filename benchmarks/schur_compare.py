"""S-assembly encoding shootout: dense vs XLA-pairs vs Pallas-pairs.

Decides the `auto` dispatch (constants.DENSE_SCHUR_MAX_ENTRIES) and the
fate of ops/schur_pallas.py with measured numbers (VERDICT r2 #2): for
each dataset, time one LM iteration (bench.py marginal methodology) under
each available encoding/backend and report ms/iter side by side.

    python benchmarks/schur_compare.py [--sets 54camsvarKD,ladybug138,...]
                                       [--out SCHUR_COMPARE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N1, N2 = 2, 8
REPS = 3


def measure(prob, dtype, schur, backend):
    import jax
    import jax.numpy as jnp

    from psba_tpu.solvers.lm import lm_run
    from psba_tpu.solvers.types import OptState, ProblemArrays, SolverConfig

    pa = ProblemArrays.from_problem(prob, dtype=dtype, schur=schur)
    cams = jnp.asarray(prob.cams, dtype)
    pts = jnp.asarray(prob.pts, dtype)
    state0 = OptState.init(pa, cams, pts)
    run = jax.jit(lm_run, static_argnames=("cfg",))
    # one compiled executable serves both run lengths (dynamic iter_cap);
    # remote compiles through the tunnel can cost minutes apiece
    cfg = SolverConfig.for_dtype(
        dtype, max_iters=N2, stop_thresh=1e-30, lm_switch_count=10_000,
        backend=backend, damping="additive",
    )

    def timed(n):
        out = run(pa, state0, cfg, iter_cap=jnp.int32(n))
        if int(out.itno) != n:
            raise RuntimeError(
                f"early exit at {int(out.itno)} flag={int(out.flag)}"
            )
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run(pa, state0, cfg, iter_cap=jnp.int32(n))
            out.ex_l2.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts), float(out.ex_l2)

    t1, _ = timed(N1)
    t2, l2 = timed(N2)
    return (t2 - t1) / (N2 - N1) * 1e3, l2


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", default="54camsvarKD,trafalgar21,ladybug138")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from benchmarks.run_all import _enable_compile_cache

    _enable_compile_cache()

    import jax.numpy as jnp

    from psba_tpu import datasets

    variants = [
        ("dense", "auto"),      # planar dense-grid kernel path (dense3)
        ("pairs", "auto"),      # XLA pair-bucket indexed_sum
        # a third variant — the ops/schur_pallas.py pair-stream kernel —
        # was measured in the round-4 shootout (SCHUR_COMPARE.json:
        # 5.1-124 ms/iter, dominated by dense at every shape) and deleted
    ]
    rows = []
    for name in args.sets.split(","):
        prob = datasets.load(name.strip())
        row = {"dataset": name, "cams": prob.n_cams, "pts": prob.n_pts,
               "obs": prob.n_obs}
        for schur, backend in variants:
            key = f"{schur}_{backend}"
            try:
                ms, l2 = measure(prob, jnp.float32, schur, backend)
                row[key + "_lm_iter_ms"] = round(ms, 3)
                row[key + "_l2"] = l2
            except Exception as e:
                row[key + "_error"] = repr(e)[:200]
            print(json.dumps(row), flush=True)
        rows.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
