"""Multi-dataset benchmark: convergence + LM-iteration timing per config.

Covers the BASELINE.json config list (3cams -> 54camsvarKD -> Trafalgar-21
-> Ladybug-138 -> Venice-52 / Rome-93 / Dubrovnik-88). Complete datasets
report final error (parity surface); synthesized BAL-scale sets report
timing/throughput (SURVEY.md §2.4 — their original points files are not
bundled).

Each row carries:
  - convergence: initial/final error, iterations, flag (+ budget_note when
    the run ends at the reference's shared 50-iteration cap,
    PSBA/levmar.cpp:100 / trust_region.cpp:112, with flag CONTINUE);
  - solve_wall_s (cold, includes compile) and solve_wall_warm_s (second
    call, compile-excluded — the number comparable to the reference's
    wall-clock report, PSBA/main.cpp:214);
  - lm_iter_ms via the repeats-MARGINAL method with a noise-floor guard
    (benchmarks/measure.py): one dispatch runs K identical fixed-length
    solves in a device-side fori_loop, and K2 escalates until the window
    t(K2)-t(K1) clears 10x the observed timer jitter; if it cannot,
    lm_iter_ms is null with a note (regression guard: a 4.5 ms window
    once produced a committed negative per-iteration time). Unlike the
    round-4 N2-escalation, the window is no longer capped by the
    dataset's f32 convergence horizon;
  - roofline accounting (sol_frac / bound / seq_steps) from
    psba_tpu.utils.roofline at the row's (C, P, O) shape.

    python benchmarks/run_all.py [--f64] [--sets a,b,c] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# iteration budget for the stop-disabled timing config (the repeats
# method only ever runs `iters`-length trajectories below this cap)
N2_MAX = 320


def _enable_compile_cache():
    """Alias kept for importers (scaling_v2); one shared implementation
    lives in benchmarks.measure."""
    from benchmarks.measure import enable_compile_cache

    enable_compile_cache()


def bench_dataset(name, dtype, iters=10, damping="auto", polish_iters=6):
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.measure import (
        lm_repeat_runner,
        make_timed_call,
        marginal_iter_ms,
    )
    from psba_tpu import constants as CC
    from psba_tpu import datasets
    from psba_tpu.solvers import SolverConfig
    from psba_tpu.solvers.hybrid import solve
    from psba_tpu.solvers.lm import lm_run
    from psba_tpu.solvers.types import (
        OptState,
        ProblemArrays,
        resolve_damping,
    )
    from psba_tpu.utils.roofline import summarize

    prob = datasets.load(name)
    row = {
        "dataset": name, "cams": prob.n_cams, "pts": prob.n_pts,
        "obs": prob.n_obs, "complete": datasets.REGISTRY[name].complete,
    }
    if prob.n_cams * prob.n_pts <= CC.DENSE_SCHUR_MAX_ENTRIES:
        # the same tile-major clustering hybrid.solve applies on dense
        # problems — the timing rows must measure the configuration the
        # default solve() actually runs (and that bench.py/knobs.py
        # measure), not the raw point order
        prob, _ = prob.with_tile_point_order()

    # resolve damping="auto" once so the row records the actual mode
    # (solve() would resolve identically; doing it here shares the probe
    # with the timing config below)
    pa = ProblemArrays.from_problem(prob, dtype=dtype)
    cams = jnp.asarray(prob.cams, dtype)
    pts = jnp.asarray(prob.pts, dtype)
    cfg_kw = {"damping": damping}
    if damping == "marquardt":
        cfg_kw["lm_switch_count"] = 10_000
    cfg0 = resolve_damping(
        SolverConfig.for_dtype(dtype, **cfg_kw), pa, cams, pts,
    )
    row["damping"] = (
        damping if damping != "auto" else f"auto->{cfg0.damping}"
    )

    # convergence (hybrid, dtype-adapted stops); second call reuses the
    # module-level jitted runners -> compile-excluded wall-clock
    res = solve(prob, cfg0, dtype=dtype)
    res_warm = solve(prob, cfg0, dtype=dtype)
    row.update(
        initial_error=res.initial_error, final_error=res.final_error,
        rms_px=float(np.sqrt(res.final_l2 / prob.n_obs)),
        iterations=res.iterations, flag=res.flag_name,
        solve_wall_s=round(res.wall_s, 3),
        solve_wall_warm_s=round(res_warm.wall_s, 3),
    )
    cap50 = SolverConfig.for_dtype(dtype).max_iters
    if res.flag_name == "CONTINUE" and res.iterations >= cap50:
        row["budget_note"] = (
            f"ended at the reference's shared {cap50}-iteration cap "
            "(levmar.cpp:100) still improving; CONTINUE = budget "
            "exhausted, not divergence"
        )
        if polish_iters and np.dtype(dtype) != np.float64:
            # the committed rms_px must not overstate the achievable
            # error: append the repo's own f64 polish (hybrid.py) and
            # report the converged companion number alongside
            res_p = solve(prob, cfg0, dtype=dtype,
                          polish_iters=polish_iters)
            row["rms_px_polished"] = float(
                np.sqrt(res_p.final_l2 / prob.n_obs)
            )
            row["polish_note"] = (
                f"+{polish_iters} float64 LM polish iterations "
                f"(flag {res_p.flag_name}); main-run rms_px above is the "
                "budget-capped f32 number"
            )

    # fixed-work LM iteration timing — repeats-marginal method
    # (benchmarks/measure.py): one dispatch runs K identical fixed-length
    # solves, so the window clears the tunnel jitter floor regardless of
    # the dataset's precision horizon
    cfg = cfg0._replace(
        max_iters=N2_MAX, stop_thresh=1e-30, lm_switch_count=10_000,
    )
    state0 = OptState.init(pa, cams, pts)
    run_repeat = lm_repeat_runner(lm_run)

    # probe the horizon: with stops disabled, a run driven past the
    # dtype's convergence floor rejects every step and escalates mu to
    # overflow (flag ERR); time only iterations before that, excluding
    # the flag-firing iteration itself (its retry storm is atypical work)
    acc, itno = run_repeat(
        pa, state0, cfg, jnp.int32(iters), jnp.int32(1)
    )
    probe_it = int(itno)
    n_iters = probe_it if probe_it >= iters else max(probe_it - 1, 0)
    if n_iters < 1:
        row["lm_iter_ms"] = None
        row["timing_note"] = (
            f"{dtype.__name__} convergence horizon at iteration "
            f"{probe_it} leaves no timeable fixed-work window"
        )
        return row
    if n_iters < iters:
        row["timing_note"] = (
            f"repeat length capped at {n_iters}: beyond it the "
            f"stop-disabled run passes the {dtype.__name__} precision "
            "floor and mu escalates to overflow"
        )

    call = make_timed_call(run_repeat, pa, state0, cfg, n_iters)
    ms, diag = marginal_iter_ms(call, n_iters, k_max=128)
    row["timing"] = diag
    if ms is None:
        row["lm_iter_ms"] = None
        row["timing_note"] = diag["note"]
    else:
        row["lm_iter_ms"] = round(ms, 3)
        row["obs_per_s"] = int(prob.n_obs / (ms * 1e-3))
        row["roofline"] = summarize(prob.n_cams, prob.n_pts, prob.n_obs, ms)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--f64", action="store_true")
    # BAL-scale sets first: under a loaded remote-compile service the run
    # can take hours, and the incremental writes below mean the rows that
    # matter most land earliest
    ap.add_argument("--sets", default=(
        "trafalgar21,dubrovnik88,ladybug138,venice52,rome93,"
        "54camsvarKD,9camsvarK,7camsvarK"
    ))
    ap.add_argument("--out", default=None)
    ap.add_argument("--damping", default="auto",
                    choices=["auto", "additive", "marquardt"],
                    help="damping model (auto = per-problem resolution "
                         "via solvers.types.resolve_damping, the "
                         "default-config behavior)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    # x64 must be enabled regardless of the row dtype: the f32 rows'
    # polish companion (hybrid polish_iters) runs real float64, which
    # would otherwise silently truncate to f32 and report a fake
    # "polished" number
    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    rows = []

    def _flush():
        # incremental: every completed row is durable even if a later
        # dataset's compile outlives the run's budget
        if args.out:
            with open(args.out, "w") as f:
                json.dump(
                    {"dtype": str(dtype.__name__), "rows": rows}, f,
                    indent=1,
                )

    def _degenerate(r):
        # LM's dp-small stop can fire on iteration 1 when additive damping
        # seeds mu at tau*max(diag) on a badly scaled problem: the first
        # step is genuinely negligible, but the "optimum" is the starting
        # point. Treat a no-progress early stop as a failed attempt.
        return (
            r.get("iterations", 99) <= 3
            and r.get("final_error", 0.0) > 0.9 * r.get("initial_error", 1.0)
        )

    for name in args.sets.split(","):
        print(f"--- {name}", file=sys.stderr, flush=True)
        try:
            r = bench_dataset(name.strip(), dtype, damping=args.damping)
            if args.damping == "additive" and _degenerate(r):
                print(f"    additive stopped with no progress "
                      f"(it={r['iterations']}); retrying marquardt",
                      file=sys.stderr, flush=True)
                r2 = bench_dataset(name.strip(), dtype, damping="marquardt")
                r2["additive_note"] = (
                    f"additive damping stopped at iteration "
                    f"{r['iterations']} ({r['flag']}) with error "
                    f"{r['final_error']:.3e} ~ initial "
                    f"{r['initial_error']:.3e}: mu = tau*max(diag U) is "
                    "~1e20 on this problem's scaling, so the first step "
                    "is below the dp-small stop"
                )
                r = r2
            rows.append(r)
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:
            # reference-parity additive damping cannot survive real BAL
            # camera scaling in f32 (diag ratios ~1e20); retry with the
            # scale-invariant Marquardt damping and record which config
            # produced the row
            print(f"    additive failed ({e!r:.120}); retrying marquardt",
                  file=sys.stderr, flush=True)
            try:
                rows.append(
                    bench_dataset(name.strip(), dtype, damping="marquardt")
                )
                rows[-1]["additive_error"] = repr(e)
                print(json.dumps(rows[-1]), flush=True)
            except Exception as e2:  # keep going; report with trace
                rows.append({
                    "dataset": name, "error": repr(e2),
                    "additive_error": repr(e),
                    "traceback": traceback.format_exc(),
                })
                print(json.dumps(
                    {k: rows[-1][k] for k in ("dataset", "error")}
                ), flush=True)
                print(rows[-1]["traceback"], file=sys.stderr, flush=True)
        _flush()
    hdr = (f"{'dataset':<14s}{'C':>5s}{'P':>8s}{'O':>9s}"
           f"{'final_rms_px':>14s}{'it':>4s}{'ms/LM-iter':>12s}"
           f"{'obs/s':>12s}{'sol%':>6s}")
    print(hdr, file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"{r['dataset']:<14s} ERROR {r['error']}", file=sys.stderr)
            continue
        it_ms = r.get("lm_iter_ms")
        sol = r.get("roofline", {}).get("sol_frac", 0.0)
        print(
            f"{r['dataset']:<14s}{r['cams']:>5d}{r['pts']:>8d}"
            f"{r['obs']:>9d}{r['rms_px']:>14.4f}{r['iterations']:>4d}"
            + (f"{it_ms:>12.3f}{r['obs_per_s']:>12d}{sol*100:>5.1f}%"
               if it_ms is not None else f"{'<noise floor':>24s}"),
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
