"""Pallas TPU kernel: Schur off-diagonal assembly over covisibility pairs.

TPU-native equivalent of kern_compute_S (CL_files/compute_S.cl:40-56): for
every covisibility pair n, accumulate Y[o1_n] W[o2_n]^T into camera-pair
bucket b_n. The kernel streams pre-gathered pair operands in transposed
[component, N] layout, forms the 36 block entries on the VPU, and reduces
them into buckets with a one-hot MXU contraction accumulated in VMEM —
the [N,6,6] contribution tensor and its separate reduction pass never
touch HBM.

For large camera counts the bucket axis is blocked (grid dim 0) so the
one-hot operand stays within VMEM; pair tiles are re-streamed per bucket
block (C <= ~100 keeps a single block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pair_kernel(y1_ref, w2_ref, bucket_ref, out_ref, *, bb):
    T = y1_ref.shape[1]
    # 36 block entries: contrib[i,k] = sum_j Y1[i*3+j] W2[k*3+j]
    rows = []
    for i in range(6):
        y = [y1_ref[i * 3 + j:i * 3 + j + 1, :] for j in range(3)]
        for k in range(6):
            w = [w2_ref[k * 3 + j:k * 3 + j + 1, :] for j in range(3)]
            rows.append(y[0] * w[0] + y[1] * w[1] + y[2] * w[2])
    prod = jnp.concatenate(rows, axis=0)                   # [36, T]

    base = pl.program_id(0) * bb
    b_row = bucket_ref[0:1, :]                             # [1, T] int32
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (bb, T), 0) + base == b_row
    ).astype(prod.dtype)                                   # [bb, T]
    part = jax.lax.dot_general(
        prod, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=prod.dtype,
        precision=jax.lax.Precision.HIGHEST,  # f32 multiplies (bf16
        # default would round the pair products to ~4e-3 rel)
    )                                                      # [36, bb]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += part


@functools.partial(jax.jit, static_argnames=("n_cams",))
def schur_off_pallas(Y, W, pair_o1, pair_o2, pair_bucket, n_cams):
    """sum over pairs of Y[o1] W[o2]^T per camera-pair bucket.

    Y, W: [O,6,3] float32. Returns off [C*C, 6, 6] (padded buckets == C*C
    fall outside every block and contribute nothing)."""
    C = n_cams
    CC = C * C
    N = pair_o1.shape[0]
    f32 = jnp.float32

    y1 = Y[pair_o1].astype(f32).reshape(N, 18).T           # [18, N]
    w2 = W[pair_o2].astype(f32).reshape(N, 18).T           # [18, N]
    bucket = pair_bucket.astype(jnp.int32)[None, :]        # [1, N]

    T = 512 if N >= 512 else 128
    N_pad = ((N + T - 1) // T) * T
    if N_pad != N:
        pad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((a.shape[0], N_pad - N), fill, a.dtype)], axis=1
        )
        y1, w2 = pad(y1, 0.0), pad(w2, 0.0)
        bucket = pad(bucket, CC)  # out-of-range: matches no block row

    # bucket blocking keeps the one-hot operand in VMEM
    bb = CC if CC <= 4096 else 2048
    CC_pad = ((CC + bb - 1) // bb) * bb
    grid = (CC_pad // bb, N_pad // T)

    # i32 index maps (a Python 0 traces as i64 under jax_enable_x64)
    row_spec = lambda k: pl.BlockSpec(
        (k, T), lambda b, i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_pair_kernel, bb=bb),
        grid=grid,
        in_specs=[row_spec(18), row_spec(18), row_spec(1)],
        out_specs=pl.BlockSpec(
            (36, bb), lambda b, i: (jnp.int32(0), b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((36, CC_pad), f32),
        interpret=_interpret(),
    )(y1, w2, bucket)
    return out[:, :CC].T.reshape(CC, 6, 6)
