"""Gill–Murray–Wright modified Cholesky (diagonal-perturbation extraction).

TPU-native equivalent of the reference's modified-Cholesky pipeline
(PSBA/cl_cholmod.cpp:25-202, CL_files/cholmod_blk.cl): when plain Cholesky
of S fails at lambda=0, the TR solver runs a GMW factorization
A + E = L D L^T with diagonal E >= 0 and bootstraps the regularizer as
lambda = |sum(E)| / n (trust_region.cpp:355-366). Only E is consumed —
the factor itself is discarded, exactly as in the reference.

Parameters delta / beta follow cl_cholmod.cpp:161-164:
  eta  = max |diag(A)|,  xi = max |offdiag(A)|
  delta = 1e-15 * max(xi + eta, 1)
  beta^2 = max(eta, xi / sqrt(n^2 - 1), 1e-15)

The factorization is the textbook column-wise GMW recurrence as one
`lax.fori_loop` over columns with full-matrix rank-1 updates (vectorized on
the VPU) — the device-side-enqueue chain of the reference collapses into
sequential loop iterations inside a single jitted computation (SURVEY.md §7
hard part (c)). Off the hot path: only invoked on Cholesky failure."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gmw_delta_beta(A):
    n = A.shape[0]
    diag = jnp.diagonal(A)
    eta = jnp.max(jnp.abs(diag))
    off = jnp.abs(A - jnp.diag(diag))
    xi = jnp.max(off)
    delta = 1e-15 * jnp.maximum(xi + eta, 1.0)
    beta2 = jnp.maximum(
        jnp.maximum(eta, xi / jnp.sqrt(float(n * n - 1))), 1e-15
    )
    return delta, beta2


def gmw_perturbation(A):
    """Return the GMW diagonal perturbation E [n] with A + E = L D L^T."""
    n = A.shape[0]
    delta, beta2 = gmw_delta_beta(A)
    idx = jnp.arange(n)

    def body(j, carry):
        c, E = carry
        below = idx > j
        col = jnp.where(below, c[:, j], 0.0)
        theta = jnp.max(jnp.abs(col))
        cjj = c[j, j]
        dj = jnp.maximum(
            jnp.maximum(jnp.abs(cjj), theta * theta / beta2), delta
        )
        E = E.at[j].set(dj - cjj)
        # rank-1 update of the trailing submatrix (col is zero at and above j,
        # so the outer product only touches rows/cols > j)
        c = c - jnp.outer(col, col) / dj
        return c, E

    _, E = jax.lax.fori_loop(
        0, n, body, (A, jnp.zeros(n, dtype=A.dtype))
    )
    return E


def gmw_bootstrap_lambda(A):
    """lambda = |sum(E)| / n (trust_region.cpp:358-364)."""
    E = gmw_perturbation(A)
    return jnp.abs(jnp.sum(E)) / A.shape[0]
