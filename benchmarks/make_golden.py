"""Generate PARITY_GOLDEN.json — pinned f64 convergence values.

The reference's verification currency is the final reprojection error
sqrt(L2)/n2Dprojs printed by its driver (PSBA/main.cpp:216-217). This
script runs the full-precision (float64) hybrid solver on every complete
bundled dataset and records {initial_error, final_error, final_l2,
iterations, flag} as the golden numbers that tests/test_golden.py then
asserts to tight tolerance. initial_error is a pure function of the input
data (no optimization), so it doubles as an I/O-parity gate.

Run on the CPU backend for reproducible f64 arithmetic:

    python benchmarks/make_golden.py [--out PARITY_GOLDEN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

COMPLETE = [
    "3cams", "5cams", "7cams", "7camsvarK", "9cams", "9camsvarK",
    "54cams", "54camsvarK", "54camsvarKD", "trafalgar21",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..",
                             "PARITY_GOLDEN.json"),
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from psba_tpu import datasets
    from psba_tpu.solvers import SolverConfig
    from psba_tpu.solvers.hybrid import solve

    golden = {}
    for name in COMPLETE:
        prob = datasets.load(name)
        res = solve(prob, SolverConfig())
        golden[name] = {
            "n_cams": prob.n_cams,
            "n_pts": prob.n_pts,
            "n_obs": prob.n_obs,
            "initial_error": res.initial_error,
            "final_error": res.final_error,
            "final_l2": res.final_l2,
            "iterations": res.iterations,
            "flag": res.flag_name,
        }
        print(f"{name:14s} err {res.initial_error:.9e} -> "
              f"{res.final_error:.9e}  it={res.iterations} "
              f"flag={res.flag_name}")

    with open(args.out, "w") as f:
        json.dump(golden, f, indent=2, sort_keys=True)
    print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
