"""64-bit-type guards for the Mosaic kernels.

Mosaic has no 64-bit types: an i64/f64 value reaching a TPU kernel
either crashes the compiler (layout.h bitwidth check), recurses its
convert-element-type rule to death, or fails func.return legalization.
CPU interpret mode — all other CI coverage of these kernels — happily
executes 64-bit values, so this class of bug ships silently and
surfaces as a broken TPU run (round 5 hit all three failure modes the
first time the kernels ran in a jax_enable_x64 process; the CLI enables
x64 unconditionally).

Known leak routes, each covered here by tracing under x64 (conftest
enables it) and walking the kernel jaxpr:
  - Python-int fori_loop bounds -> i64 induction variable;
  - Python numeric literals in jnp.where with no array operand -> weak
    f64/i64;
  - numpy index arrays (np.triu_indices etc.) closed over as i64;
  - memory_space-only BlockSpecs under a grid -> synthesized default
    index maps returning Python-int zeros (i64 func.return) — guarded
    structurally by ops.linearize_dense._smem_spec, which this test
    asserts is used for every SMEM operand.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _walk_jaxprs(jx, found):
    for eqn in jx.eqns:
        if eqn.primitive.name == "pallas_call":
            found.append(eqn.params["jaxpr"])
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", v)
            if hasattr(inner, "eqns"):
                _walk_jaxprs(inner, found)


def _assert_no_64bit_in_kernels(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    kernels = []
    _walk_jaxprs(jaxpr.jaxpr, kernels)
    assert kernels, "no pallas_call found — did the trace take a kernel path?"
    for kj in kernels:
        txt = str(kj)
        assert "i64" not in txt and "f64" not in txt, (
            "64-bit type inside a Mosaic kernel jaxpr:\n"
            + "\n".join(l for l in txt.splitlines()
                        if "i64" in l or "f64" in l)
        )


@pytest.fixture(scope="module")
def dense_fixture():
    from psba_tpu.io import synthetic_problem
    from psba_tpu.solvers.types import ProblemArrays

    prob = synthetic_problem(n_cams=4, n_pts=64, seed=0)
    pa = ProblemArrays.from_problem(prob, dtype=jnp.float32)
    cams = jnp.asarray(prob.cams, jnp.float32)
    pts = jnp.asarray(prob.pts, jnp.float32)
    return pa, cams, pts


def test_x64_linearize_dense(dense_fixture):
    from psba_tpu.ops.linearize_dense import linearize_dense_pallas

    pa, cams, pts = dense_fixture
    _assert_no_64bit_in_kernels(
        lambda c, p: linearize_dense_pallas(
            pa.K, pa.q0, c, p, pa.obs_du, pa.obs_dv, pa.valid_d,
            want_u=True, tile_mask=pa.tile_mask,
        )[0],
        cams, pts,
    )


def test_x64_gain_and_jgram(dense_fixture):
    from psba_tpu.ops.residual_dense import (
        gain_dense_pallas,
        jgram_dense_pallas,
    )

    pa, cams, pts = dense_fixture
    _assert_no_64bit_in_kernels(
        lambda c, p: gain_dense_pallas(
            pa.K, pa.q0, c, p, c, p, pa.obs_du, pa.obs_dv, pa.valid_d,
            tile_mask=pa.tile_mask,
        )[0],
        cams, pts,
    )
    pc = jnp.zeros((1, pa.n_cams, 6), jnp.float32)
    pp = jnp.zeros((1, 3, pa.obs_du.shape[1]), jnp.float32)
    _assert_no_64bit_in_kernels(
        lambda c, p: jgram_dense_pallas(
            pa.K, pa.q0, c, p, pa.valid_d, pc, pp,
            tile_mask=pa.tile_mask,
        ),
        cams, pts,
    )


def test_x64_obs_stream_kernels(dense_fixture):
    from psba_tpu.ops.linearize_pallas import (
        linearize_pallas,
        residual_l2_pallas,
    )

    pa, cams, pts = dense_fixture
    C, P = pa.n_cams, pts.shape[0]
    _assert_no_64bit_in_kernels(
        lambda c, p: linearize_pallas(
            pa.K, pa.q0, c, p, pa.obs, pa.cam_idx, pa.pt_idx, None, C, P,
        )[1],
        cams, pts,
    )
    _assert_no_64bit_in_kernels(
        lambda c, p: residual_l2_pallas(
            pa.K, pa.q0, c, p, pa.obs, pa.cam_idx, pa.pt_idx, None,
        )[1],
        cams, pts,
    )


def test_x64_cholesky():
    from psba_tpu.ops.cholesky_pallas import spd_solve_pallas

    rng = np.random.default_rng(0)
    A = rng.standard_normal((24, 24)).astype(np.float32)
    S = jnp.asarray(A @ A.T + 24 * np.eye(24, dtype=np.float32))
    b = jnp.asarray(np.ones(24, np.float32))
    _assert_no_64bit_in_kernels(
        lambda S_, b_: spd_solve_pallas(S_, b_)[0], S, b
    )


def test_smem_specs_have_explicit_index_maps():
    """Every SMEM BlockSpec used under a grid must carry an explicit
    block shape + i32 index map (ops.linearize_dense._smem_spec): a
    memory_space-only spec gets a synthesized default index map whose
    Python-int zeros become an i64 func.return under x64."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in (
        "psba_tpu/ops/linearize_dense.py",
        "psba_tpu/ops/residual_dense.py",
    ):
        src = open(os.path.join(repo, path)).read()
        assert not re.search(
            r"pl\.BlockSpec\(memory_space=pltpu\.SMEM\)", src
        ), f"{path}: bare SMEM BlockSpec (use _smem_spec)"
