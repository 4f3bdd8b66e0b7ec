"""Assemble SCALING.json v2: the defensible scaling evidence set.

Replaces the round-2 artifact whose headline `efficiency` column measured
a 2-physical-core virtual CPU mesh (meaningless as multi-chip evidence,
VERDICT r2 weak #1). v2 contains exactly what this single-chip fleet can
support:

  1. measured_tpu_sharded_mesh1 — the sharded solver (shard_map + Mosaic
     Pallas kernels + psum collectives) executed ON THE REAL TPU with a
     1-device mesh: proves the distributed path compiles and runs on
     hardware, and its overhead vs the unsharded solver bounds the
     collective-free cost of the sharded formulation;
  2. comm_model — the analytic ring-all-reduce model over the exact
     per-iteration collective payload (benchmarks/comm_model.py), fed by
     the measured single-chip iteration times in RESULTS.json, predicting
     weak/strong-scaling efficiency over stated ICI/DCN assumptions;
  3. virtual_mesh_overhead — the CPU virtual-mesh rows, demoted to the
     only number they support (overhead_vs_1dev; see
     benchmarks/scaling.py docstring).

    python benchmarks/scaling_v2.py [--skip-tpu] [--out SCALING.json]
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

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure_tpu_sharded_mesh1(dataset="trafalgar21", n_iters=12):
    """Marginal LM-iteration time of the SHARDED path on the real TPU
    (mesh with 1 device -> collectives are no-ops but the full shard_map
    + host-local-shard machinery and Mosaic kernel path runs).

    Round-5 method: the repeats-marginal measurement every other
    artifact uses (benchmarks.measure) — one dispatch runs K identical
    12-iteration sharded solves, K2 escalating past the 10x
    trimmed-jitter floor. The r4 recording (0.95 ms) used a sub-floor
    8-iteration min-of-3 window and is superseded."""
    import jax
    import jax.numpy as jnp

    from benchmarks.measure import marginal_iter_ms
    from psba_tpu import datasets
    from psba_tpu.parallel.shard import (
        make_sharded_lm_repeat,
        make_sharded_runners,
        shard_problem,
    )
    from psba_tpu.solvers.types import SolverConfig

    assert jax.default_backend() == "tpu", jax.default_backend()
    prob = datasets.load(dataset)
    dtype = jnp.float32
    cfg = SolverConfig.for_dtype(
        dtype, max_iters=320, stop_thresh=1e-30, lm_switch_count=10_000,
        damping="additive",  # trafalgar21's auto resolution (RESULTS.json)
    )
    sp = shard_problem(prob, 1)
    mesh = jax.make_mesh((1,), ("obs",))
    pa, cams0, pts0, init_s, _, _ = make_sharded_runners(
        sp, cfg, mesh, dtype=dtype
    )
    state0 = init_s(pa, cams0, pts0)
    rep = make_sharded_lm_repeat(sp, cfg, mesh)

    acc, itno = rep(pa, state0, jnp.int32(n_iters), jnp.int32(2))
    assert int(itno) == 2 * n_iters, (int(itno), float(acc))

    def call(k):
        t0 = time.perf_counter()
        acc, _ = rep(pa, state0, jnp.int32(n_iters), jnp.int32(k))
        float(acc)
        return time.perf_counter() - t0

    ms, diag = marginal_iter_ms(call, n_iters, k_max=128)
    return {
        "dataset": dataset,
        "device": str(jax.devices()[0]),
        "mesh_devices": 1,
        "schur": "dense" if sp.blk is not None else "pairs",
        "backend": "pallas (Mosaic, via shard_map)",
        "lm_iter_ms": None if ms is None else round(ms, 3),
        "timing": diag,
        "ex_l2_after_2x12_iters": float(acc),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(HERE, "SCALING.json"))
    args = ap.parse_args(argv)

    from benchmarks.run_all import _enable_compile_cache

    _enable_compile_cache()

    out = {"version": 2, "doc": __doc__.split("\n")[0]}

    # 1. real-TPU sharded run
    if not args.skip_tpu:
        out["measured_tpu_sharded_mesh1"] = measure_tpu_sharded_mesh1()

    # 2. analytic comm model fed by RESULTS.json
    from benchmarks import comm_model

    rows = []
    rpath = os.path.join(HERE, "RESULTS.json")
    if os.path.exists(rpath):
        from psba_tpu.utils.roofline import lm_iter_roofline

        with open(rpath) as f:
            for row in json.load(f)["rows"]:
                it = row.get("lm_iter_ms")
                if it is None or it < 0.2:
                    continue  # unmeasurable / below tunnel noise
                C, P, O = row["cams"], row["pts"], row["obs"]
                it = row["lm_iter_ms"]
                roof = lm_iter_roofline(C, P, O)
                hbm_ms = roof.bytes / 8.19e11 * 1e3
                pay = comm_model.payload_floats(C)
                rows.append({
                    "dataset": row["dataset"], "cams": C, "pts": P,
                    "obs": O,
                    "measured_1chip_lm_iter_ms": it,
                    "hbm_scaling_ms": round(hbm_ms, 4),
                    "fixed_latency_ms": round(max(it - hbm_ms, 0), 4),
                    "S_bytes_per_psum": pay["S_floats"] * comm_model.B,
                    "collective_floats_per_iter": pay["total_floats"],
                    "predictions": {
                        "ici_weak": {
                            str(D): comm_model.predict(
                                C, it, hbm_ms, D, comm_model.ICI_BW,
                                comm_model.ICI_LAT, weak=True)
                            for D in (2, 4, 8)
                        },
                        "ici_strong": {
                            str(D): comm_model.predict(
                                C, it, hbm_ms, D, comm_model.ICI_BW,
                                comm_model.ICI_LAT)
                            for D in (2, 4, 8)
                        },
                        "dcn_2host_weak": comm_model.predict(
                            C, it, hbm_ms, 2, comm_model.DCN_BW,
                            comm_model.DCN_LAT, weak=True),
                    },
                })
    out["comm_model"] = {
        "assumptions": {
            "ici_bw_Bps": comm_model.ICI_BW,
            "ici_lat_s": comm_model.ICI_LAT,
            "dcn_bw_Bps": comm_model.DCN_BW,
            "dcn_lat_s": comm_model.DCN_LAT,
            "note": "ring all-reduce, collectives unfused (conservative);"
                    " see benchmarks/comm_model.py",
        },
        "rows": rows,
    }

    # 3. demoted virtual-mesh overhead (previous SCALING.json rows)
    old = os.path.join(HERE, "SCALING.json")
    if os.path.exists(old):
        with open(old) as f:
            prev = json.load(f)
        if "rows" in prev:  # v1 file
            out["virtual_mesh_overhead"] = {
                "doc": "CPU virtual mesh (devices share 2 physical "
                       "cores): only overhead_vs_1dev is meaningful "
                       "(benchmarks/scaling.py docstring); the v1 "
                       "'efficiency' column measured core "
                       "oversubscription, not scaling",
                "backend": prev.get("backend"),
                "rows": [
                    {k: r[k] for k in
                     ("n_devices", "lm_iter_ms", "overhead_vs_1dev")}
                    for r in prev["rows"]
                ],
            }
        elif "virtual_mesh_overhead" in prev:
            out["virtual_mesh_overhead"] = prev["virtual_mesh_overhead"]

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (v if not isinstance(v, dict) else "...")
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
