"""Analytic ICI/DCN communication model for the sharded LM iteration.

Purpose (BASELINE.md north star: >=80% observations/s efficiency at
2 hosts): this fleet has ONE physical TPU chip, so multi-chip efficiency
cannot be measured here. What can be produced honestly is
  (a) an exact count of the per-iteration collective payload of the
      sharded solver (psba_tpu/parallel/shard.py partitioning: points
      sharded, cameras + reduced camera system replicated), read off the
      solver code, and
  (b) a standard ring all-reduce cost model over stated v5e ICI / DCN
      assumptions, combined with the *measured* single-chip iteration
      time split into its HBM-scaling part (the roofline bytes, which
      shard with the point axis) and its fixed dispatch/latency part
      (which does not shard).

Collective payload per LM iteration (solvers/lm.py, dense path; per
damping retry where marked):
  outer:  psum(U)  36 C floats   + psum(ga) 6 C   + pmax(max_diag) 1
  retry:  psum(S off-diagonal) 36 C^2   [or reduce_scatter+all_gather]
          psum(ea term) 6 C
          5 scalar psums (vok/ok reduction, dp_l2, new_l2, gain, denom)
  accept: psum(params_l2) 1
The steady state (accepted first try) is outer + 1 x retry.

Model: ring all-reduce of B bytes over D devices on bandwidth W with
per-step latency L:  t = 2 B (D-1)/D / W + (D-1) L.  Every collective in
the iteration is issued separately (no fusion assumed — conservative).

v5e assumptions (stated, from public "How to Scale Your Model" numbers):
  ICI: 4.5e10 B/s one-way per axis, ~1 us per-step latency
  DCN: 2.5e10 B/s per host, ~25 us per-step latency (2-host mesh where
       the mesh axis crosses hosts; intra-pod v5e slices ride ICI even
       across hosts, so DCN is the pessimistic bound)

    python benchmarks/comm_model.py [--results RESULTS.json]
                                    [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

B = 4  # f32 fast path

ICI_BW = 4.5e10     # bytes/s, one-way, per axis
ICI_LAT = 1e-6      # s per ring step
DCN_BW = 2.5e10     # bytes/s per host
DCN_LAT = 25e-6     # s per ring step


def payload_floats(C, retries=1.0):
    """Per-iteration collective float counts (dense path, steady state)."""
    outer_arrays = 36 * C + 6 * C
    outer_scalars = 1
    retry_arrays = 36 * C * C + 6 * C
    retry_scalars = 5
    accept_scalars = 1
    return {
        "outer_floats": outer_arrays + outer_scalars,
        "retry_floats_each": retry_arrays + retry_scalars,
        "S_floats": 36 * C * C,
        "total_floats": (
            outer_arrays + outer_scalars + accept_scalars
            + retries * (retry_arrays + retry_scalars)
        ),
        "n_collectives": 3 + retries * 7,
    }


def ring_allreduce_s(bytes_, D, bw, lat):
    if D <= 1:
        return 0.0
    return 2.0 * bytes_ * (D - 1) / D / bw + (D - 1) * lat


def iter_comm_s(C, D, bw, lat, retries=1.0):
    """Sum the per-collective ring costs (issued separately)."""
    coll = (
        [36 * C, 6 * C, 1, 1]
        + [36 * C * C, 6 * C, 1, 1, 1, 1, 1] * int(round(retries))
    )
    return sum(ring_allreduce_s(n * B, D, bw, lat) for n in coll)


def predict(C, iter_ms, hbm_ms, D, bw, lat, weak=False):
    """Predicted iteration time and observations/s efficiency at D devices.

    iter_ms is the measured single-chip iteration; hbm_ms is its
    HBM-roofline part (scales 1/D with the sharded point axis); the
    remainder is fixed dispatch/sequential latency (does not shard).
    weak=True holds the local problem constant (fixed local P): compute
    time stays iter_ms and throughput ideally scales D-fold.
    """
    fixed_ms = max(iter_ms - hbm_ms, 0.0)
    comm_ms = iter_comm_s(C, D, bw, lat) * 1e3
    if weak:
        t = iter_ms + comm_ms
        eff = iter_ms / t
    else:
        t = fixed_ms + hbm_ms / D + comm_ms
        eff = iter_ms / (D * t)
    return {"iter_ms": round(t, 4), "efficiency": round(eff, 4)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=None,
                    help="RESULTS.json for measured iteration times")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from psba_tpu.utils.roofline import lm_iter_roofline

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    rpath = args.results or os.path.join(here, "RESULTS.json")
    if os.path.exists(rpath):
        with open(rpath) as f:
            for row in json.load(f)["rows"]:
                if "lm_iter_ms" in row:
                    results[row["dataset"]] = row

    fallback = {  # bench.py measurements if RESULTS.json is absent
        "trafalgar21": {"cams": 21, "pts": 11315, "obs": 36455,
                        "lm_iter_ms": 0.910},
    }
    rows = []
    for name, row in (results or fallback).items():
        C, P, O = row["cams"], row["pts"], row["obs"]
        it = row["lm_iter_ms"]
        roof = lm_iter_roofline(C, P, O)
        hbm_ms = roof.bytes / 8.19e11 * 1e3  # v5e HBM part of the iter
        pay = payload_floats(C)
        entry = {
            "dataset": name, "cams": C, "pts": P, "obs": O,
            "measured_1chip_lm_iter_ms": it,
            "hbm_scaling_ms": round(hbm_ms, 4),
            "fixed_latency_ms": round(max(it - hbm_ms, 0.0), 4),
            "payload": pay,
            "S_bytes": pay["S_floats"] * B,
            "predictions": {
                "ici_strong": {
                    str(D): predict(C, it, hbm_ms, D, ICI_BW, ICI_LAT)
                    for D in (2, 4, 8)
                },
                "ici_weak": {
                    str(D): predict(C, it, hbm_ms, D, ICI_BW, ICI_LAT,
                                    weak=True)
                    for D in (2, 4, 8)
                },
                "dcn_2host_weak": predict(
                    C, it, hbm_ms, 2, DCN_BW, DCN_LAT, weak=True
                ),
                "dcn_2host_strong": predict(
                    C, it, hbm_ms, 2, DCN_BW, DCN_LAT
                ),
            },
        }
        rows.append(entry)
        print(json.dumps(entry))
    out = {
        "model": "ring all-reduce over stated v5e ICI/DCN assumptions; "
                 "see benchmarks/comm_model.py docstring",
        "assumptions": {
            "ici_bw_Bps": ICI_BW, "ici_lat_s": ICI_LAT,
            "dcn_bw_Bps": DCN_BW, "dcn_lat_s": DCN_LAT,
            "itemsize": B,
        },
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
