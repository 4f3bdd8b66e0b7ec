"""Per-stage TPU device-time profile of one LM iteration's compute pieces.

Not part of the benchmark contract (bench.py is); this is the developer
tool behind PROFILE_r05.json — each dense3 pipeline stage measured against
its roofline cost (psba_tpu.utils.roofline.lm_stage_costs). Per-dispatch
RPC overhead (tens of ms through a tunneled device) swamps single-op
timing, so each stage runs k times inside an on-device `lax.fori_loop`
(dynamic trip count: one compile per stage) and the per-call time is the
noise-guarded marginal (benchmarks.measure.marginal_iter_ms): k2
escalates until the window clears 10x the observed timer jitter. A
data-dependent perturbation is threaded through the loop carry so XLA
cannot hoist the body.

    python benchmarks/profile_stages.py [--out PROFILE_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from benchmarks.measure import marginal_iter_ms
from psba_tpu.core.linalg import spd_solve
from psba_tpu.core.schur import (
    back_substitute_dense3,
    damp_v_planar,
    inv3x3_planar3,
    reduced_rhs_dense3,
    schur_S_dense3,
)
from psba_tpu.io import load_problem
from psba_tpu.ops.linearize_dense import linearize_dense_pallas
from psba_tpu.ops.linearize_pallas import linearize_pallas, residual_l2_pallas
from psba_tpu.ops.residual_dense import gain_dense_pallas
from psba_tpu.solvers.types import ProblemArrays


def stage_call(make_body, seed, ops):
    """Bind a stage into the call(k)->seconds shape marginal_iter_ms
    consumes: k back-to-back stage executions in one dispatch. The
    stage's array operands ride as jit ARGUMENTS — closed-over arrays
    would be baked into the program as constants, which at BAL scale
    blows up the serialized compile request (HTTP 413 through the
    tunnel) and XLA's scoped-VMEM planning."""

    @jax.jit
    def loop(n, eps, ops):
        def body(_, e):
            return make_body(e, *ops) * 1e-30 + eps

        return jax.lax.fori_loop(0, n, body, eps)

    def call(k):
        t0 = time.perf_counter()
        float(loop(jnp.int32(k), seed, ops))
        return time.perf_counter() - t0

    return call


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--dataset", default=None,
                    help="registry dataset (default: trafalgar21 files)")
    args = ap.parse_args(argv)

    from benchmarks.measure import enable_compile_cache

    enable_compile_cache()

    if args.dataset:
        from psba_tpu import datasets

        prob = datasets.load(args.dataset)
        ds_name = args.dataset
    else:
        data = "/root/reference/data"
        prob = load_problem(
            f"{data}/Trafalgar-21-11315-cams.txt",
            f"{data}/Trafalgar-21-11315-pts.txt",
        )
        ds_name = "trafalgar21"
    prob, _ = prob.with_tile_point_order()  # what hybrid.solve runs
    dtype = jnp.float32
    pa = ProblemArrays.from_problem(prob, dtype=dtype)
    cams = jnp.asarray(prob.cams, dtype)
    pts = jnp.asarray(prob.pts, dtype)
    C, P = pa.n_cams, pts.shape[0]
    seed = jnp.asarray(0.0, dtype)

    # materialize intermediates once (planar dense3 pipeline, solvers/lm.py)
    ZW0, ZW1, ZW2, Vp0, gbp3, _Pp, U, ga = linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, pa.valid_d,
        want_u=True, tile_mask=pa.tile_mask,
    )
    ZW3 = (ZW0, ZW1, ZW2)
    mu = jnp.asarray(1e-3, dtype)
    U_d = U + mu * jnp.eye(6, dtype=dtype)
    Vp_d = damp_v_planar(Vp0, mu)
    Vinv3, _ = inv3x3_planar3(Vp_d)
    S, ZY3 = schur_S_dense3(U_d, ZW3, Vinv3)
    ea = reduced_rhs_dense3(ga, gbp3, ZY3)
    dpa_flat, ok = spd_solve(S, ea.reshape(-1))
    dpa = dpa_flat.reshape(C, 6)

    # (operands, fn(eps, *operands)) per stage: operands are jit args
    stages = {
        # the one dense-grid kernel per outer iteration (ZW/V/gb + U/ga)
        "linearize_dense": ((cams,), lambda e, cams_: jnp.sum(
            linearize_dense_pallas(
                pa.K, pa.q0, cams_ + e, pts, pa.obs_du, pa.obs_dv,
                pa.valid_d, want_u=True, tile_mask=pa.tile_mask,
            )[0])),
        # per damping retry
        "inv3x3": ((Vp_d,), lambda e, Vp_d_: jnp.sum(
            inv3x3_planar3(Vp_d_ + e)[0])),
        "schur_S_dense": ((U_d, ZW0, ZW1, ZW2, Vinv3),
                          lambda e, U_, z0, z1, z2, Vi: jnp.sum(
            schur_S_dense3(U_, (z0 + e, z1, z2), Vi)[0])),
        "reduced_rhs_dense": ((ga, gbp3, ZY3),
                              lambda e, ga_, gb_, zy_: jnp.sum(
            reduced_rhs_dense3(ga_ + e, gb_, zy_))),
        "spd_solve": ((S, ea), lambda e, S_, ea_: jnp.sum(
            spd_solve(S_, ea_.reshape(-1) + e)[0])),
        "back_substitute": ((gbp3, ZW3, Vinv3, dpa),
                            lambda e, gb_, zw_, Vi, dpa_: jnp.sum(
            back_substitute_dense3(gb_, zw_, Vi, dpa_ + e))),
        "gain_dense": ((cams, pts), lambda e, cams_, pts_: gain_dense_pallas(
            pa.K, pa.q0, cams_ + e, pts_, cams_, pts_, pa.obs_du,
            pa.obs_dv, pa.valid_d, tile_mask=pa.tile_mask,
        )[0]),
        "damp_uv": ((Vp0,), lambda e, Vp0_: jnp.sum(
            damp_v_planar(Vp0_, mu + e))),
        # obs-stream kernels (pairs/non-dense3 paths, for comparison)
        "linearize_pallas": ((cams,), lambda e, cams_: linearize_pallas(
            pa.K, pa.q0, cams_ + e, pts, pa.obs, pa.cam_idx, pa.pt_idx,
            pa.valid, C, P, want_point=False, want_w=False,
        )[1]),
        "residual_l2_pallas": ((cams,), lambda e, cams_: residual_l2_pallas(
            pa.K, pa.q0, cams_ + e, pts, pa.obs, pa.cam_idx, pa.pt_idx,
            pa.valid,
        )[1]),
    }
    from psba_tpu.utils.roofline import V5E, lm_stage_costs

    costs = lm_stage_costs(C, P, pa.n_obs)
    rows = []
    total = 0.0
    print(f"{'stage':22s} {'measured':>10s} {'roofline':>10s} "
          f"{'%SoL':>6s}  bound", file=sys.stderr)
    for name, (ops, body) in stages.items():
        call = stage_call(body, seed, ops)
        try:
            ms, diag = marginal_iter_ms(call, 1, k1=8, k_max=8192)
        except Exception as e:  # per-stage compile OOM etc.: the
            # fori-loop harness can push a kernel's scoped-VMEM
            # allocation over the limit even when the solver context
            # compiles fine (XLA stack-allocates the looped outputs)
            ms, diag = None, {"error": repr(e)[:300]}
        row = {"stage": name, "measured_ms": None if ms is None
               else round(ms, 5), "timing": diag}
        c = costs.get(name) or costs.get(name + "_dense")
        if c is not None:
            row["roofline_ms"] = round(c.ms(V5E), 5)
            row["bound"] = c.bound(V5E)
            if ms is not None:
                row["sol_frac"] = round(c.ms(V5E) / ms, 4)
        rows.append(row)
        if ms is not None and not name.endswith("_pallas"):
            total += ms
        mss = (
            "   <error" if "error" in diag
            else "   <floor" if ms is None else f"{ms:8.4f} ms"
        )
        sol = (f"{row.get('roofline_ms', 0):8.4f} ms "
               f"{100 * row.get('sol_frac', 0):5.1f}%  "
               f"{row.get('bound', '')}" if c is not None else "")
        print(f"{name:22s} {mss} {sol}", file=sys.stderr)
    print(f"{'SUM (dense3 stages)':22s} {total:8.4f} ms", file=sys.stderr)

    out = {
        "dataset": ds_name,
        "C": C, "P": P, "O": pa.n_obs,
        "device": str(jax.devices()[0]),
        "note": (
            "per-stage device time, repeats-marginal with 10x noise "
            "guard; 'SUM' counts each dense3 stage once (one outer "
            "linearize + one retry chain + one gain); the whole-solver "
            "bench (BENCH_r05) is the contract number"
        ),
        "sum_dense3_ms": round(total, 4),
        "rows": rows,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
