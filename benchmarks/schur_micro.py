"""Microbench of the dense Schur assembly as the solver uses it:
ZW fixed (loop-invariant per outer iteration), Vinv perturbed per retry.
Also tests MXU-alignment padding of the [6C, 3P] contraction.
"""

import time

import jax
import jax.numpy as jnp

from psba_tpu.core.schur import schur_S_dense, stack_blocks
from psba_tpu.io import load_problem
from psba_tpu.ops.linearize_pallas import linearize_pallas
from psba_tpu.solvers.types import ProblemArrays

N1, N2 = 4, 24


def marginal_ms(make_body, seed):
    def timed(n):
        def loop(eps):
            def body(_, e):
                return make_body(e) * 1e-30 + eps
            return jax.lax.fori_loop(0, n, body, eps)

        fn = jax.jit(loop)
        float(fn(seed))
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

    ex, l2, U, V, W, ga, gb, _, _ = linearize_pallas(
        pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx, pa.valid, C, P
    )
    ZW = stack_blocks(W, pa.blk_idx)
    mu = jnp.asarray(1e-3, dtype)
    V_d = V.at[:, jnp.arange(3), jnp.arange(3)].add(mu)
    U_d = U.at[:, jnp.arange(6), jnp.arange(6)].add(mu)
    from psba_tpu.core.schur import inv3x3
    Vinv, _ = inv3x3(V_d)

    # in-context: ZW fixed, Vinv perturbed (what the damping retry loop does)
    ms = marginal_ms(
        lambda e: jnp.sum(schur_S_dense(U_d, ZW, Vinv + e)[0]), seed
    )
    print(f"schur_S_dense (Vinv perturbed, ZW fixed)  {ms:8.4f} ms")

    # ZW perturbed (old profiler style)
    ms = marginal_ms(
        lambda e: jnp.sum(schur_S_dense(U_d, ZW + e, Vinv)[0]), seed
    )
    print(f"schur_S_dense (ZW perturbed)              {ms:8.4f} ms")

    # padded variant: pad 3P -> mult of 512, 6C -> 128
    P3 = P * 3
    P3p = (P3 + 511) // 512 * 512
    Cp = 128
    a0 = ZW.reshape(C * 6, P3)
    ap = jnp.zeros((Cp, P3p), dtype).at[: C * 6, :P3].set(a0)

    def padded(e):
        Vb = (Vinv + e)[None, None]
        ZY = (
            ZW[..., 0:1] * Vb[..., 0, :]
            + ZW[..., 1:2] * Vb[..., 1, :]
            + ZW[..., 2:3] * Vb[..., 2, :]
        )
        zy = jnp.zeros((Cp, P3p), dtype).at[: C * 6, :P3].set(
            ZY.reshape(C * 6, P3)
        )
        off = jnp.matmul(zy, ap.T, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(off)

    ms = marginal_ms(padded, seed)
    print(f"schur padded (128 x {P3p})                {ms:8.4f} ms")

    # raw matmul only, unpadded, HIGHEST
    b0 = ZW.reshape(C * 6, P3)

    def raw(e):
        return jnp.sum(
            jnp.matmul(
                b0 + e, b0.T, precision=jax.lax.Precision.HIGHEST
            )
        )

    print(f"raw matmul [126,{P3}] HIGHEST             "
          f"{marginal_ms(raw, seed):8.4f} ms")

    def raw_default(e):
        return jnp.sum(jnp.matmul(b0 + e, b0.T))

    print(f"raw matmul default precision              "
          f"{marginal_ms(raw_default, seed):8.4f} ms")

    # ZY build alone
    def zy_only(e):
        Vb = (Vinv + e)[None, None]
        ZY = (
            ZW[..., 0:1] * Vb[..., 0, :]
            + ZW[..., 1:2] * Vb[..., 1, :]
            + ZW[..., 2:3] * Vb[..., 2, :]
        )
        return jnp.sum(ZY)

    print(f"ZY build alone                            "
          f"{marginal_ms(zy_only, seed):8.4f} ms")


if __name__ == "__main__":
    main()


def main2():
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

    ex, l2, U, V, W, ga, gb, _, _ = linearize_pallas(
        pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx, pa.valid, C, P
    )
    ZW = stack_blocks(W, pa.blk_idx)
    mu = jnp.asarray(1e-3, dtype)
    V_d = V.at[:, jnp.arange(3), jnp.arange(3)].add(mu)
    U_d = U.at[:, jnp.arange(6), jnp.arange(6)].add(mu)
    from psba_tpu.core.schur import inv3x3
    Vinv, _ = inv3x3(V_d)
    P3 = P * 3
    b0 = ZW.reshape(C * 6, P3)
    eyeC = jnp.eye(C, dtype=dtype)

    # sum-of-squares readout defeats XLA's sum(A@B) simplification
    def raw_sq(e):
        m = jnp.matmul(b0 + e, b0.T, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(m * m)

    print(f"raw matmul HIGHEST (sq readout)   {marginal_ms(raw_sq, seed):8.4f} ms")

    def raw_sq_def(e):
        m = jnp.matmul(b0 + e, b0.T)
        return jnp.sum(m * m)

    print(f"raw matmul default (sq readout)   {marginal_ms(raw_sq_def, seed):8.4f} ms")

    # scatter diag add alone
    off0 = jnp.matmul(b0, b0.T, precision=jax.lax.Precision.HIGHEST)

    def scatter_only(e):
        S = (-off0).reshape(C, 6, C, 6)
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(U_d + e)
        return jnp.sum(S * S)

    print(f"diag scatter-add alone            {marginal_ms(scatter_only, seed):8.4f} ms")

    def mask_only(e):
        S = (-off0).reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * (U_d + e)[:, :, None, :]
        return jnp.sum(S * S)

    print(f"diag broadcast-add alone          {marginal_ms(mask_only, seed):8.4f} ms")

    # full schur_S_dense with broadcast diag
    def schur_bcast(e):
        Vb = (Vinv + e)[None, None]
        ZY = (
            ZW[..., 0:1] * Vb[..., 0, :]
            + ZW[..., 1:2] * Vb[..., 1, :]
            + ZW[..., 2:3] * Vb[..., 2, :]
        )
        a = ZY.reshape(C * 6, P3)
        off = jnp.matmul(a, b0.T, precision=jax.lax.Precision.HIGHEST)
        S = -off.reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * U_d[:, :, None, :]
        S = S.reshape(6 * C, 6 * C)
        return jnp.sum(S * S)

    print(f"schur_S_dense broadcast-diag      {marginal_ms(schur_bcast, seed):8.4f} ms")


main2()


def main3():
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
    ex, l2, U, V, W, ga, gb, _, _ = linearize_pallas(
        pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx, pa.valid, C, P
    )
    ZW = stack_blocks(W, pa.blk_idx)
    mu = jnp.asarray(1e-3, dtype)
    V_d = V.at[:, jnp.arange(3), jnp.arange(3)].add(mu)
    U_d = U.at[:, jnp.arange(6), jnp.arange(6)].add(mu)
    from psba_tpu.core.schur import inv3x3
    Vinv, _ = inv3x3(V_d)
    P3 = P * 3
    b0 = ZW.reshape(C * 6, P3)
    eyeC = jnp.eye(C, dtype=dtype)

    def schur_barrier(e):
        Vb = (Vinv + e)[None, None]
        ZY = (
            ZW[..., 0:1] * Vb[..., 0, :]
            + ZW[..., 1:2] * Vb[..., 1, :]
            + ZW[..., 2:3] * Vb[..., 2, :]
        )
        ZY = jax.lax.optimization_barrier(ZY)
        a = ZY.reshape(C * 6, P3)
        off = jnp.matmul(a, b0.T, precision=jax.lax.Precision.HIGHEST)
        S = -off.reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * U_d[:, :, None, :]
        return jnp.sum(S * S)

    print(f"schur w/ barrier after ZY         {marginal_ms(schur_barrier, seed):8.4f} ms")

    # variant: ZY via batched matmul over p instead of broadcast FMA
    def schur_einsum_zy(e):
        ZY = jnp.einsum(
            "cipj,pjk->cipk", ZW, Vinv + e,
            precision=jax.lax.Precision.HIGHEST,
        )
        ZY = jax.lax.optimization_barrier(ZY)
        a = ZY.reshape(C * 6, P3)
        off = jnp.matmul(a, b0.T, precision=jax.lax.Precision.HIGHEST)
        S = -off.reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * U_d[:, :, None, :]
        return jnp.sum(S * S)

    print(f"schur einsum-ZY + barrier         {marginal_ms(schur_einsum_zy, seed):8.4f} ms")

    # no barrier, but ZY built via einsum
    def schur_einsum_nb(e):
        ZY = jnp.einsum(
            "cipj,pjk->cipk", ZW, Vinv + e,
            precision=jax.lax.Precision.HIGHEST,
        )
        a = ZY.reshape(C * 6, P3)
        off = jnp.matmul(a, b0.T, precision=jax.lax.Precision.HIGHEST)
        S = -off.reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * U_d[:, :, None, :]
        return jnp.sum(S * S)

    print(f"schur einsum-ZY no barrier        {marginal_ms(schur_einsum_nb, seed):8.4f} ms")


main3()


def main4():
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
    ex, l2, U, V, W, ga, gb, _, _ = linearize_pallas(
        pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx, pa.valid, C, P
    )
    ZW = stack_blocks(W, pa.blk_idx)
    mu = jnp.asarray(1e-3, dtype)
    V_d = V.at[:, jnp.arange(3), jnp.arange(3)].add(mu)
    U_d = U.at[:, jnp.arange(6), jnp.arange(6)].add(mu)
    from psba_tpu.core.schur import inv3x3
    Vinv, _ = inv3x3(V_d)
    eyeC = jnp.eye(C, dtype=dtype)

    # plane-separated layout: ZW3[j] = [6C, P], lane dim = P
    ZW3 = ZW.transpose(3, 0, 1, 2).reshape(3, C * 6, P)
    ZW3 = jax.device_put(ZW3)
    VinvT = Vinv.transpose(1, 2, 0)  # [3(j),3(k),P]

    def schur_planes(e):
        Vv = VinvT + e  # [3,3,P]
        # ZY3[k] = sum_j ZW3[j] * Vinv[p, j, k]
        ZY3 = jnp.einsum("jrp,jkp->krp", ZW3, Vv)
        off = jax.lax.dot_general(
            ZY3, ZW3,
            dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [6C, 6C]
        S = -off.reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * U_d[:, :, None, :]
        return jnp.sum(S * S)

    print(f"schur planes [3,6C,P]             {marginal_ms(schur_planes, seed):8.4f} ms")

    def schur_planes_fma(e):
        Vv = VinvT + e
        ZY3 = jnp.stack([
            ZW3[0] * Vv[0, k][None, :]
            + ZW3[1] * Vv[1, k][None, :]
            + ZW3[2] * Vv[2, k][None, :]
            for k in range(3)
        ])
        off = jax.lax.dot_general(
            ZY3, ZW3,
            dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        S = -off.reshape(C, 6, C, 6)
        S = S + eyeC[:, None, :, None] * U_d[:, :, None, :]
        return jnp.sum(S * S)

    print(f"schur planes FMA                  {marginal_ms(schur_planes_fma, seed):8.4f} ms")

    # correctness check vs schur_S_dense
    S_ref, ZY_ref = schur_S_dense(U_d, ZW, Vinv)
    ZY3 = jnp.einsum("jrp,jkp->krp", ZW3, VinvT)
    off = jax.lax.dot_general(
        ZY3, ZW3, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    S_new = -off.reshape(C, 6, C, 6)
    S_new = S_new + eyeC[:, None, :, None] * U_d[:, :, None, :]
    S_new = S_new.reshape(6 * C, 6 * C)
    import numpy as np
    err = float(jnp.max(jnp.abs(S_new - S_ref)) / (jnp.max(jnp.abs(S_ref)) + 1e-30))
    print(f"max rel err vs schur_S_dense: {err:.3e}")


main4()
