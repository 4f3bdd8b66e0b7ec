"""Pallas kernel vs XLA reference-implementation parity tests.

On CPU these run the kernels in interpreter mode; the same code compiles
via Mosaic on TPU (exercised by bench.py and the TPU driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psba_tpu.core.hessian import assemble_blocks
from psba_tpu.core.jacobian import jacobians
from psba_tpu.core.residual import error_l2, residuals
from psba_tpu.ops.linearize_pallas import linearize_pallas, residual_l2_pallas
from psba_tpu.ops.reduce import indexed_sum


@pytest.fixture(scope="module")
def fx(prob_synth):
    p = prob_synth.with_pairs()
    f32 = jnp.float32
    rng = np.random.default_rng(7)
    cams = jnp.array(
        p.cams + 1e-3 * rng.standard_normal(p.cams.shape), f32
    )
    pts = jnp.array(p.pts, f32)
    return p, jnp.array(p.K, f32), jnp.array(p.q0, f32), cams, pts


def test_linearize_matches_xla(fx):
    p, K, q0, cams, pts = fx
    obs = jnp.array(p.obs, jnp.float32)
    ex_x = residuals(K, q0, cams, pts, obs, p.cam_idx, p.pt_idx)
    A_x, B_x = jacobians(K, q0, cams, pts, p.cam_idx, p.pt_idx)
    U_x, V_x, W_x, ga_x, gb_x = assemble_blocks(
        A_x, B_x, ex_x, p.cam_idx, p.pt_idx, p.n_cams, p.n_pts
    )
    ex, l2, U, V, W, ga, gb, A, B = linearize_pallas(
        K, q0, cams, pts, obs, jnp.asarray(p.cam_idx),
        jnp.asarray(p.pt_idx), None, p.n_cams, p.n_pts, want_jac=True,
    )
    rel = lambda a, b: float(
        jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30)
    )
    # f32 roundoff along a different evaluation order; residual magnitudes
    # here are O(px) against O(1e3) projection coordinates
    assert rel(ex, ex_x) < 1e-4
    assert rel(A, A_x) < 1e-5 and rel(B, B_x) < 1e-5
    assert rel(U, U_x) < 1e-5 and rel(V, V_x) < 1e-5
    assert rel(W, W_x) < 1e-5
    assert rel(ga, ga_x) < 1e-3 and rel(gb, gb_x) < 1e-3  # cancellation
    np.testing.assert_allclose(
        float(l2), float(error_l2(ex_x)), rtol=1e-5
    )


def test_linearize_valid_mask(fx):
    """Padded observations must contribute nothing."""
    p, K, q0, cams, pts = fx
    obs = jnp.array(p.obs, jnp.float32)
    O = p.n_obs
    valid = jnp.arange(O) < (O - 7)
    ex, l2, U, V, W, ga, gb, _, _ = linearize_pallas(
        K, q0, cams, pts, obs, jnp.asarray(p.cam_idx),
        jnp.asarray(p.pt_idx), valid, p.n_cams, p.n_pts,
    )
    # reference: XLA path with the same mask
    ex_x = residuals(K, q0, cams, pts, obs, p.cam_idx, p.pt_idx)
    A_x, B_x = jacobians(K, q0, cams, pts, p.cam_idx, p.pt_idx)
    U_x, V_x, W_x, ga_x, gb_x = assemble_blocks(
        A_x, B_x, ex_x, p.cam_idx, p.pt_idx, p.n_cams, p.n_pts, valid=valid
    )
    # scale-aware gate: U's entries span ~7 orders of magnitude, and on
    # real TPU both paths carry ~2.4e-7 * max|U| of f32 accumulation
    # noise (measured against f64), which a per-element rtol would
    # misread as a 2% error on the smallest entries
    err = np.max(np.abs(np.asarray(U) - np.asarray(U_x)))
    assert err <= 2e-6 * np.max(np.abs(np.asarray(U_x))), err
    np.testing.assert_allclose(
        float(l2), float(error_l2(ex_x, valid=valid)), rtol=1e-5
    )


def test_residual_l2_kernel(fx):
    p, K, q0, cams, pts = fx
    obs = jnp.array(p.obs, jnp.float32)
    ex, l2 = residual_l2_pallas(
        K, q0, cams, pts, obs, jnp.asarray(p.cam_idx),
        jnp.asarray(p.pt_idx), None,
    )
    ex_x = residuals(K, q0, cams, pts, obs, p.cam_idx, p.pt_idx)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(ex_x), atol=1e-3)
    np.testing.assert_allclose(float(l2), float(error_l2(ex_x)), rtol=1e-5)


def test_indexed_sum_modes():
    rng = np.random.default_rng(1)
    data = jnp.array(rng.standard_normal((100, 7)), jnp.float32)
    idx = jnp.array(rng.integers(0, 13, 100), jnp.int32)
    a = indexed_sum(data, idx, 13, force="matmul")
    b = indexed_sum(data, idx, 13, force="scatter")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
    # out-of-range index contributes nothing in both modes
    idx2 = idx.at[0].set(13)
    a2 = indexed_sum(data, idx2, 13, force="matmul")
    b2 = indexed_sum(data, idx2, 13, force="scatter")
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=1e-5,
                               atol=1e-5)


def test_solver_pallas_backend_cpu(prob_synth):
    """Force the pallas backend through the full solver (interpret mode)."""
    from psba_tpu.solvers import SolverConfig
    from psba_tpu.solvers.hybrid import solve

    res_x = solve(prob_synth, SolverConfig.for_dtype(
        jnp.float32, backend="xla"), dtype=jnp.float32)
    res_p = solve(prob_synth, SolverConfig.for_dtype(
        jnp.float32, backend="pallas"), dtype=jnp.float32)
    assert res_p.final_l2 < 1.05 * res_x.final_l2
    # the s_precision="high" knob (3-pass Schur matmuls) must still
    # converge to the same neighborhood (on CPU Precision is a no-op for
    # f32, so this mainly guards the trace-time plumbing)
    res_h = solve(prob_synth, SolverConfig.for_dtype(
        jnp.float32, backend="pallas", s_precision="high"),
        dtype=jnp.float32)
    assert res_h.final_l2 < 1.05 * res_x.final_l2


def test_linearize_dense_matches_xla(prob_synth):
    """Dense-grid kernel (ops.linearize_dense_pallas): ZW/V/gb must match
    the XLA jacobian + assemble_blocks + stack_blocks route."""
    from psba_tpu.core.schur import stack_blocks
    from psba_tpu.ops.linearize_dense import linearize_dense_pallas
    from psba_tpu.solvers.types import ProblemArrays

    p = prob_synth.with_blk()
    f32 = jnp.float32
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    cams = jnp.asarray(p.cams, f32)
    pts = jnp.asarray(p.pts, f32)
    C, P = p.n_cams, p.n_pts

    ZW0, ZW1, ZW2, Vp, gbp, Pp = linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, pa.valid_d
    )

    A, B = jacobians(pa.K, pa.q0, cams, pts, pa.cam_idx, pa.pt_idx)
    ex = residuals(pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx)
    _U, V, W, _ga, gb = assemble_blocks(
        A, B, ex, pa.cam_idx, pa.pt_idx, C, P, coeff=1.0
    )
    ZWr = stack_blocks(W, pa.blk_idx).reshape(6 * C, 3, P)

    rel = lambda a, b: float(
        jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30)
    )
    for k, Zk in enumerate((ZW0, ZW1, ZW2)):
        assert rel(Zk[:, :P], ZWr[:, k, :]) < 1e-5
        # padded planar columns must be exactly zero
        assert float(jnp.max(jnp.abs(Zk[:, P:]))) == 0.0 if Pp > P else True
    assert rel(Vp[:, :, :P], jnp.transpose(V, (1, 2, 0))) < 1e-5
    assert rel(gbp[:, :P], gb.T) < 1e-3  # cancellation (see ga/gb above)
    assert float(jnp.max(jnp.abs(gbp[:, P:]))) == 0.0 if Pp > P else True


def test_linearize_dense_chunk_padding(prob_synth, monkeypatch):
    """Camera chunking (in-kernel fori_loop over G cameras per grid
    step) with a padded final chunk: force G below n_cams so zero-padded
    camera slots are exercised; outputs must be invariant to G."""
    from psba_tpu.ops import linearize_dense as ld

    p = prob_synth.with_blk()
    f32 = jnp.float32
    from psba_tpu.solvers.types import ProblemArrays
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    cams = jnp.asarray(p.cams, f32)
    pts = jnp.asarray(p.pts, f32)
    assert p.n_cams >= 3, "fixture too small to chunk"

    ref = ld.linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, pa.valid_d,
        want_u=True,
    )
    # G = 2 with odd-ish C forces ceil-division chunking + a padded slot
    monkeypatch.setattr(ld, "G_MAX", 2)
    ld.linearize_dense_pallas.clear_cache()
    try:
        out = ld.linearize_dense_pallas(
            pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, pa.valid_d,
            want_u=True,
        )
    finally:
        monkeypatch.undo()
        ld.linearize_dense_pallas.clear_cache()
    for a, b in zip(
        (ref[0], ref[1], ref[2], ref[3], ref[4], ref[6], ref[7]),
        (out[0], out[1], out[2], out[3], out[4], out[6], out[7]),
    ):
        # V/U accumulate per chunk then across chunks: a different (but
        # equally valid) f32 summation order than the single-chunk run
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_linearize_dense_u_ga_matches_xla(prob_synth):
    """want_u=True: the fused camera-side U (A^T A) and ga (A^T ex) must
    match the XLA jacobians + assemble_blocks route."""
    from psba_tpu.ops.linearize_dense import linearize_dense_pallas
    from psba_tpu.solvers.types import ProblemArrays

    p = prob_synth.with_blk()
    f32 = jnp.float32
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    cams = jnp.asarray(p.cams, f32)
    pts = jnp.asarray(p.pts, f32)
    C, P = p.n_cams, p.n_pts

    out = linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, pa.valid_d,
        want_u=True,
    )
    U, ga = out[6], out[7]

    A, B = jacobians(pa.K, pa.q0, cams, pts, pa.cam_idx, pa.pt_idx)
    ex = residuals(pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx)
    U_x, _V, _W, ga_x, _gb = assemble_blocks(
        A, B, ex, pa.cam_idx, pa.pt_idx, C, P, coeff=1.0
    )
    rel = lambda a, b: float(
        jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30)
    )
    assert rel(U, U_x) < 1e-5
    assert rel(ga, ga_x) < 1e-3  # cancellation (see ga gate above)
    # symmetry is exact by construction
    np.testing.assert_array_equal(
        np.asarray(U), np.asarray(jnp.swapaxes(U, 1, 2))
    )


def test_gain_dense_matches_xla(prob_synth):
    """Dense-grid gain kernel (ops.residual_dense.gain_dense_pallas):
    (gain, new_l2) must match residuals + error_l2_diff/error_l2 on the
    observation stream."""
    from psba_tpu.core.residual import error_l2_diff
    from psba_tpu.ops.residual_dense import gain_dense_pallas
    from psba_tpu.solvers.types import ProblemArrays

    p = prob_synth.with_blk()
    f32 = jnp.float32
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    rng = np.random.default_rng(3)
    cams = jnp.asarray(p.cams, f32)
    pts = jnp.asarray(p.pts, f32)
    new_cams = cams + jnp.asarray(
        1e-3 * rng.standard_normal(cams.shape), f32
    )
    new_pts = pts + jnp.asarray(
        1e-3 * rng.standard_normal(pts.shape), f32
    )

    gain, new_l2 = gain_dense_pallas(
        pa.K, pa.q0, cams, pts, new_cams, new_pts,
        pa.obs_du, pa.obs_dv, pa.valid_d,
    )

    ex_o = residuals(pa.K, pa.q0, cams, pts, pa.obs, pa.cam_idx, pa.pt_idx)
    ex_n = residuals(
        pa.K, pa.q0, new_cams, new_pts, pa.obs, pa.cam_idx, pa.pt_idx
    )
    gain_x = float(error_l2_diff(ex_o, ex_n))
    l2_x = float(error_l2(ex_n))
    np.testing.assert_allclose(float(gain), gain_x, rtol=1e-4)
    np.testing.assert_allclose(float(new_l2), l2_x, rtol=1e-5)


def test_jgram_dense_matches_jmultiply(prob_synth):
    """Dense J-gram kernel: G[a,b] = <J x_a, J x_b> must match explicit
    jmultiply materialization on the observation stream."""
    from psba_tpu.core.jacobian import jmultiply
    from psba_tpu.ops.residual_dense import jgram_dense_pallas
    from psba_tpu.solvers.types import ProblemArrays

    p = prob_synth.with_blk()
    f32 = jnp.float32
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    rng = np.random.default_rng(11)
    cams = jnp.asarray(p.cams, f32)
    pts = jnp.asarray(p.pts, f32)
    C, P = p.n_cams, p.n_pts

    dirs_c = jnp.asarray(rng.standard_normal((2, C, 6)), f32)
    dp_raw = rng.standard_normal((2, P, 3))
    # planar [n, 3, P] point parts
    dirs_p = jnp.asarray(np.transpose(dp_raw, (0, 2, 1)), f32)

    Gm = jgram_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.valid_d, dirs_c, dirs_p
    )

    A, B = jacobians(pa.K, pa.q0, cams, pts, pa.cam_idx, pa.pt_idx)
    jx = [
        jmultiply(A, B, dirs_c[a], jnp.asarray(dp_raw[a], f32),
                  pa.cam_idx, pa.pt_idx)
        for a in range(2)
    ]
    ref = np.array([
        [float(jnp.sum(jx[a] * jx[b])) for b in range(2)] for a in range(2)
    ])
    np.testing.assert_allclose(np.asarray(Gm), ref, rtol=1e-4)


def test_tile_mask_skip_exact(prob_synth):
    """The per-(camera, tile) occupancy skip must be exact: with a
    camera whose observations are all masked out (empty tile row), the
    masked kernels must reproduce the unmasked outputs bit-for-bit."""
    from psba_tpu.ops.linearize_dense import (
        build_tile_mask,
        linearize_dense_pallas,
    )
    from psba_tpu.ops.residual_dense import (
        gain_dense_pallas,
        jgram_dense_pallas,
    )
    from psba_tpu.solvers.types import ProblemArrays

    p = prob_synth.with_blk()
    f32 = jnp.float32
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    cams = jnp.asarray(p.cams, f32)
    pts = jnp.asarray(p.pts, f32)
    C, P = p.n_cams, p.n_pts

    # empty camera 0: its whole tile row becomes skippable
    vd = pa.valid_d.at[0].set(0.0)
    mask = jnp.asarray(build_tile_mask(vd))
    assert int(mask[0].sum()) == 0 and int(mask.sum()) > 0

    ref = linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, vd, want_u=True
    )
    out = linearize_dense_pallas(
        pa.K, pa.q0, cams, pts, pa.obs_du, pa.obs_dv, vd, want_u=True,
        tile_mask=mask,
    )
    for a, b in zip(
        (ref[0], ref[1], ref[2], ref[3], ref[4], ref[6], ref[7]),
        (out[0], out[1], out[2], out[3], out[4], out[6], out[7]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(5)
    new_cams = cams + jnp.asarray(
        1e-3 * rng.standard_normal(cams.shape), f32
    )
    new_pts = pts + jnp.asarray(1e-3 * rng.standard_normal(pts.shape), f32)
    g_ref = gain_dense_pallas(
        pa.K, pa.q0, cams, pts, new_cams, new_pts,
        pa.obs_du, pa.obs_dv, vd,
    )
    g_out = gain_dense_pallas(
        pa.K, pa.q0, cams, pts, new_cams, new_pts,
        pa.obs_du, pa.obs_dv, vd, tile_mask=mask,
    )
    assert float(g_ref[0]) == float(g_out[0])
    assert float(g_ref[1]) == float(g_out[1])

    dirs_c = jnp.asarray(rng.standard_normal((1, C, 6)), f32)
    dirs_p = jnp.asarray(rng.standard_normal((1, 3, P)), f32)
    j_ref = jgram_dense_pallas(pa.K, pa.q0, cams, pts, vd, dirs_c, dirs_p)
    j_out = jgram_dense_pallas(
        pa.K, pa.q0, cams, pts, vd, dirs_c, dirs_p, tile_mask=mask
    )
    np.testing.assert_array_equal(np.asarray(j_ref), np.asarray(j_out))


def test_tile_point_order_roundtrip(prob_synth):
    """with_tile_point_order must preserve problem semantics (initial
    L2 invariant, valid invariants) and solve() must return pts in the
    caller's original order."""
    import jax

    from psba_tpu.core.residual import error_l2, residuals
    from psba_tpu.solvers import SolverConfig
    from psba_tpu.solvers.hybrid import solve

    p = prob_synth
    p2, newpos = p.with_tile_point_order()
    p2.validate()
    # permutation is a bijection and maps points consistently
    np.testing.assert_array_equal(
        np.sort(np.asarray(newpos)), np.arange(p.n_pts)
    )
    np.testing.assert_allclose(p2.pts[newpos], p.pts)
    l2a = float(error_l2(residuals(
        jnp.asarray(p.K), jnp.asarray(p.q0), jnp.asarray(p.cams),
        jnp.asarray(p.pts), jnp.asarray(p.obs),
        jnp.asarray(p.cam_idx), jnp.asarray(p.pt_idx),
    )))
    l2b = float(error_l2(residuals(
        jnp.asarray(p2.K), jnp.asarray(p2.q0), jnp.asarray(p2.cams),
        jnp.asarray(p2.pts), jnp.asarray(p2.obs),
        jnp.asarray(p2.cam_idx), jnp.asarray(p2.pt_idx),
    )))
    np.testing.assert_allclose(l2a, l2b, rtol=1e-12)

    # 0-iteration solve: output pts must equal the input in-order
    res = solve(p, SolverConfig(max_iters=0), dtype=jnp.float64)
    np.testing.assert_allclose(res.pts, np.asarray(p.pts), rtol=1e-12)


def test_dense_padded_lanes_identity(prob_synth):
    """Padded planar V lanes are seeded with identity so inv3x3_planar3's
    ok flag (and its lax.cond fallback gate) ignore them: at mu=0 the
    undamped GN solve must be reported ok (vok True), and the pivoted-det
    fallback must not be triggered by padding at small mu (regression:
    all-zero padded blocks made vok always-False on the dense3 path and
    tripped the fallback once mu^3 < 1e-16)."""
    from psba_tpu.core.schur import damp_v_planar, inv3x3_planar3
    from psba_tpu.ops.linearize_dense import linearize_dense_pallas
    from psba_tpu.solvers.types import ProblemArrays

    p = prob_synth.with_blk()
    f32 = jnp.float32
    pa = ProblemArrays.from_problem(p, dtype=f32, schur="dense")
    _, _, _, Vp, _, Pp = linearize_dense_pallas(
        pa.K, pa.q0, jnp.asarray(p.cams, f32), jnp.asarray(p.pts, f32),
        pa.obs_du, pa.obs_dv, pa.valid_d
    )
    assert Pp > p.n_pts  # fixture must actually exercise padding
    pad = np.asarray(Vp[:, :, p.n_pts:])
    np.testing.assert_array_equal(
        pad, np.broadcast_to(np.eye(3, dtype=np.float32)[:, :, None],
                             pad.shape)
    )
    # undamped: ok despite padding
    _, ok0 = inv3x3_planar3(Vp)
    assert bool(ok0)
    # small damping: ok, and padded dets sit at (1+mu)^3 far from the
    # 1e-16 fallback gate
    _, ok_mu = inv3x3_planar3(damp_v_planar(Vp, jnp.float32(1e-7)))
    assert bool(ok_mu)


def test_solver_pallas_dense3_sharded(prob_synth):
    """Dense-grid planar path under shard_map (4 virtual devices)."""
    import jax as _jax

    if len(_jax.devices()) < 4:
        pytest.skip("needs 4 devices (PSBA_TEST_TPU runs on 1 real chip)")
    from psba_tpu.parallel.shard import solve_sharded
    from psba_tpu.solvers import SolverConfig
    from psba_tpu.solvers.hybrid import solve

    cfg = SolverConfig.for_dtype(jnp.float32, backend="pallas")
    r1 = solve(prob_synth, cfg, dtype=jnp.float32)
    r4 = solve_sharded(prob_synth, cfg, n_devices=4, dtype=jnp.float32)
    np.testing.assert_allclose(r4.final_l2, r1.final_l2, rtol=1e-4)
