"""Unit tests for quaternion / pinhole models against the scalar oracle."""

import numpy as np
import jax.numpy as jnp

from psba_tpu.models import (
    compose_local,
    quat_multiply,
    quat_normalize_vec,
    quat_rotate,
    quat_to_matrix,
)
from tests import oracle


def rand_unit_quat(rng, n):
    q = rng.standard_normal((n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= np.where(q[:, :1] >= 0, 1.0, -1.0)
    return q


def test_quat_multiply_matches_oracle():
    rng = np.random.default_rng(0)
    q = rand_unit_quat(rng, 16)
    r = rand_unit_quat(rng, 16)
    got = np.asarray(quat_multiply(jnp.array(q), jnp.array(r)))
    want = np.stack([oracle.quat_mul(q[i], r[i]) for i in range(16)])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_rotate_matches_sandwich():
    rng = np.random.default_rng(1)
    q = rand_unit_quat(rng, 32)
    p = rng.standard_normal((32, 3))
    got = np.asarray(quat_rotate(jnp.array(q), jnp.array(p)))
    want = np.empty_like(p)
    for i in range(32):
        want[i] = oracle.quat_mul(
            oracle.quat_mul(q[i], np.concatenate([[0.0], p[i]])),
            np.array([q[i, 0], -q[i, 1], -q[i, 2], -q[i, 3]]),
        )[1:]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_rotation_matrix_consistent():
    rng = np.random.default_rng(2)
    q = rand_unit_quat(rng, 8)
    p = rng.standard_normal((8, 3))
    R = np.asarray(quat_to_matrix(jnp.array(q)))
    want = np.asarray(quat_rotate(jnp.array(q), jnp.array(p)))
    got = np.einsum("nij,nj->ni", R, p)
    np.testing.assert_allclose(got, want, atol=1e-13)
    # orthonormality
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (8, 1, 1)),
        atol=1e-13,
    )


def test_compose_local_identity():
    rng = np.random.default_rng(3)
    q0 = rand_unit_quat(rng, 4)
    v = np.zeros((4, 3))
    got = np.asarray(compose_local(jnp.array(v), jnp.array(q0)))
    np.testing.assert_allclose(got, q0, atol=1e-15)


def test_normalize_vec_sign_fix():
    q = np.array([[-0.5, 0.5, 0.5, 0.5], [2.0, 0.0, 0.0, 0.0]])
    vec, qn = quat_normalize_vec(jnp.array(q))
    qn = np.asarray(qn)
    assert np.all(qn[:, 0] >= 0)
    np.testing.assert_allclose(np.linalg.norm(qn, axis=1), 1.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(vec), qn[:, 1:], atol=0)
