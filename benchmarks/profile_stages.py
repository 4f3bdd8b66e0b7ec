"""Per-stage TPU device-time profile of one LM iteration's compute pieces.

Not part of the benchmark contract (bench.py is); this is a developer tool
to find the next hotspot. Per-dispatch RPC overhead (tens of ms through a
tunneled device) swamps single-op timing, so each stage is measured by the
MARGINAL method: run it N1 and N2 times inside an on-device `lax.fori_loop`
and report (t(N2) - t(N1)) / (N2 - N1). A data-dependent perturbation is
threaded through the loop carry so XLA cannot hoist the body.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

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
from psba_tpu.solvers.types import ProblemArrays

N1, N2 = 4, 24


def marginal_ms(make_body, seed):
    """make_body(eps) -> scalar; eps is a data-dependent f32 scalar."""

    def timed(n):
        def loop(eps):
            def body(_, e):
                return make_body(e) * 1e-30 + eps
            return jax.lax.fori_loop(0, n, body, eps)

        fn = jax.jit(loop)
        out = fn(seed)
        float(out)  # warm + sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(seed))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (timed(N2) - timed(N1)) / (N2 - N1) * 1e3


def main():
    data = "/root/reference/data"
    prob = load_problem(
        f"{data}/Trafalgar-21-11315-cams.txt",
        f"{data}/Trafalgar-21-11315-pts.txt",
    )
    dtype = jnp.float32
    pa = ProblemArrays.from_problem(prob, dtype=dtype)
    cams = jnp.asarray(prob.cams, dtype)
    pts = jnp.asarray(prob.pts, dtype)
    C, P = pa.n_cams, pts.shape[0]
    seed = jnp.asarray(0.0, dtype)

    # materialize intermediates once (planar dense3 pipeline, solvers/lm.py)
    ex, l2, U, _, _, ga, _, _, _ = linearize_pallas(
        pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx, pa.valid,
        C, P, want_point=False, want_w=False,
    )
    ZW0, ZW1, ZW2, Vp0, gbp3, _Pp = linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, pa.valid_d
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

    stages = {
        "linearize_pallas": lambda e: linearize_pallas(
            pa.K, pa.q0, cams + e, pts, pa.obs, pa.cam_idx, pa.pt_idx,
            pa.valid, C, P, want_point=False, want_w=False,
        )[1],
        "linearize_dense": lambda e: jnp.sum(linearize_dense_pallas(
            pa.K, pa.q0, cams + e, pts, pa.obs_du, pa.obs_dv, pa.valid_d,
        )[0]),
        "residual_l2_pallas": lambda e: residual_l2_pallas(
            pa.K, pa.q0, cams + e, pts, pa.obs, pa.cam_idx, pa.pt_idx,
            pa.valid,
        )[1],
        "inv3x3": lambda e: jnp.sum(inv3x3_planar3(Vp_d + e)[0]),
        "schur_S_dense": lambda e: jnp.sum(
            schur_S_dense3(U_d, (ZW0 + e, ZW1, ZW2), Vinv3)[0]
        ),
        "reduced_rhs_dense": lambda e: jnp.sum(
            reduced_rhs_dense3(ga + e, gbp3, ZY3)
        ),
        "spd_solve": lambda e: jnp.sum(spd_solve(S, ea.reshape(-1) + e)[0]),
        "back_substitute": lambda e: jnp.sum(
            back_substitute_dense3(gbp3, ZW3, Vinv3, dpa + e)
        ),
        "damp_uv": lambda e: jnp.sum(damp_v_planar(Vp0, mu + e)),
    }
    from psba_tpu.utils.roofline import lm_stage_costs, V5E

    costs = lm_stage_costs(C, P, pa.n_obs)
    total = 0.0
    print(f"{'stage':22s} {'measured':>10s} {'roofline':>10s} "
          f"{'%SoL':>6s}  bound")
    for name, body in stages.items():
        ms = marginal_ms(body, seed)
        total += ms
        c = costs.get(name) or costs.get(name + "_dense")
        if c is not None:
            sol = c.ms(V5E)
            pct = 100.0 * sol / ms if ms > 0 else 0.0
            print(f"{name:22s} {ms:8.4f} ms {sol:8.4f} ms {pct:5.1f}%"
                  f"  {c.bound(V5E)}")
        else:
            print(f"{name:22s} {ms:8.4f} ms {'—':>10s}")
    print(f"{'SUM':22s} {total:8.4f} ms")


if __name__ == "__main__":
    main()
