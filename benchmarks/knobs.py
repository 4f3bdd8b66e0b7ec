"""Measured evidence for the performance knobs + the TR-phase cost.

Round 4 shipped two perf knobs whose claims lived only in docstrings
(VERDICT r4 weak #3): `s_precision="high"` (3-pass MXU Schur matmuls,
types.py) and the tile-clustering occupancy skip (`tile_mask`,
ops/linearize_dense.py). This script measures both, plus the TR-phase
iteration cost that had never appeared in a bench artifact (VERDICT r4
missing #3), and writes KNOBS_r05.json:

  - s_precision highest vs high on rome93 (C=93: the O(C^2 P) Schur
    matmuls dominate at BAL camera counts): LM ms/iter + final L2 after
    the same fixed iteration count (the accuracy price).
  - tile_mask on trafalgar21: raw point order + no mask, clustered
    order + no mask, clustered + mask (the default solve config) —
    separating the clustering win from the masking win.
  - tr_iter_ms on rome93: one dogleg model evaluation per iteration via
    tr_run (trust_region.cpp:112-279 parity phase).

All timings use the repeats-marginal noise-guarded method
(benchmarks/measure.py). Run on TPU:  python benchmarks/knobs.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    from benchmarks.measure import enable_compile_cache

    enable_compile_cache()


def timed_variant(run, pa, state0, cfg, iters=10, k_max=64):
    """(ms_per_iter|None, diag, final_l2_fixed_work) for one solver
    variant; probes the dtype horizon exactly like run_all."""
    import jax.numpy as jnp

    from benchmarks.measure import (
        lm_repeat_runner,
        make_timed_call,
        marginal_iter_ms,
    )

    run_repeat = lm_repeat_runner(run)
    acc, itno = run_repeat(pa, state0, cfg, jnp.int32(iters), jnp.int32(1))
    probe_it = int(itno)
    # exclude the flag-firing iteration (its mu-escalation retry storm is
    # atypical work); bail rather than publish it when nothing remains —
    # same policy as run_all.py's ladder rows
    n = probe_it if probe_it >= iters else probe_it - 1
    if n < 1:
        return None, {"note": (
            f"convergence horizon at iteration {probe_it} leaves no "
            "timeable fixed-work window")}, float(acc), 0
    acc, itno = run_repeat(pa, state0, cfg, jnp.int32(n), jnp.int32(1))
    final_l2 = float(acc)
    call = make_timed_call(run_repeat, pa, state0, cfg, n)
    ms, diag = marginal_iter_ms(call, n, k_max=k_max)
    return ms, diag, final_l2, n


def main():
    import jax
    import jax.numpy as jnp

    _cache()
    from psba_tpu import datasets
    from psba_tpu.solvers.lm import lm_run
    from psba_tpu.solvers.tr import tr_run
    from psba_tpu.solvers.types import OptState, ProblemArrays, SolverConfig

    rows = []
    f32 = jnp.float32

    # ---------------- s_precision: rome93 ----------------
    rome = datasets.load("rome93")
    rome, _ = rome.with_tile_point_order()
    pa = ProblemArrays.from_problem(rome, dtype=f32)
    state0 = OptState.init(
        pa, jnp.asarray(rome.cams, f32), jnp.asarray(rome.pts, f32)
    )
    for sprec in ("highest", "high"):
        cfg = SolverConfig.for_dtype(
            f32, max_iters=320, stop_thresh=1e-30, lm_switch_count=10_000,
            damping="additive", s_precision=sprec,
        )
        ms, diag, l2, n = timed_variant(lm_run, pa, state0, cfg)
        rows.append({
            "knob": "s_precision", "dataset": "rome93", "value": sprec,
            "lm_iter_ms": None if ms is None else round(ms, 3),
            "final_l2_fixed_work": l2, "iters": n, "timing": diag,
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    # ---------------- tile_mask / clustering: trafalgar21 ----------------
    from psba_tpu.io import load_problem

    data = "/root/reference/data"
    traf_raw = load_problem(
        f"{data}/Trafalgar-21-11315-cams.txt",
        f"{data}/Trafalgar-21-11315-pts.txt",
    )
    traf_clu, _ = traf_raw.with_tile_point_order()
    variants = [
        ("raw-order,no-mask", traf_raw, False),
        ("clustered,no-mask", traf_clu, False),
        ("clustered,mask", traf_clu, True),
    ]
    for label, prob, want_mask in variants:
        pa_t = ProblemArrays.from_problem(prob, dtype=f32)
        if not want_mask:
            pa_t = pa_t._replace(tile_mask=None)
        st0 = OptState.init(
            pa_t, jnp.asarray(prob.cams, f32), jnp.asarray(prob.pts, f32)
        )
        cfg = SolverConfig.for_dtype(
            f32, max_iters=320, stop_thresh=1e-30, lm_switch_count=10_000,
            damping="additive",
        )
        ms, diag, l2, n = timed_variant(
            lm_run, pa_t, st0, cfg, iters=12, k_max=128
        )
        rows.append({
            "knob": "tile_mask", "dataset": "trafalgar21", "value": label,
            "lm_iter_ms": None if ms is None else round(ms, 3),
            "final_l2_fixed_work": l2, "iters": n, "timing": diag,
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    # ---------------- TR phase: rome93 ----------------
    cfg_tr = SolverConfig.for_dtype(
        f32, max_iters=320, stop_thresh=1e-30, damping="additive",
    )
    ms, diag, l2, n = timed_variant(tr_run, pa, state0, cfg_tr)
    rows.append({
        "knob": "tr_phase", "dataset": "rome93", "value": "dogleg",
        "tr_iter_ms": None if ms is None else round(ms, 3),
        "final_l2_fixed_work": l2, "iters": n, "timing": diag,
    })
    print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    out = {"device": str(jax.devices()[0]), "rows": rows}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "KNOBS_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
