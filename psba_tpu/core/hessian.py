"""Block Hessian assembly: U, V, W, g.

TPU-native equivalents of kern_compute_U / _V / _Wblks / _g
(CL_files/compute_U.cl, compute_V.cl, compute_Wblks.cl, compute_g.cl).
The reference launches one work-item per matrix element, each looping over
the dense (point x cam) lookup table blk_idx; here each quantity is a
batched block product over observations followed by a segment reduction:

  U_j = coeff * sum_{o: cam(o)=j} A_o^T A_o        [C,6,6]
  V_i = coeff * sum_{o: pt(o)=i}  B_o^T B_o        [P,3,3]
  W_o = coeff * A_o^T B_o                          [O,6,3]   (per-observation)
  ga_j = coeff * sum_{o: cam(o)=j} A_o^T ex_o      [C,6]
  gb_i = coeff * sum_{o: pt(o)=i}  B_o^T ex_o      [P,3]

`coeff` is +1 in the LM loop (levmar.cpp:104-108) and +2 / -2 for the
B = 2 J^T J / g = -2 J^T ex convention in the TR loop
(trust_region.cpp:122-137).

Damping (kern_update_UV / kern_restore_UVdiag) is functional here: damped
copies are produced by `damp_uv`, the originals simply stay alive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_blocks(A, B, ex, cam_idx, pt_idx, n_cams, n_pts, coeff=1.0,
                    valid=None):
    """Return (U [C,6,6], V [P,3,3], W [O,6,3], ga [C,6], gb [P,3]).

    `valid` [O] bool masks padded observations (distributed path)."""
    if valid is not None:
        m = valid[:, None, None]
        A = jnp.where(m, A, 0.0)
        B = jnp.where(m, B, 0.0)
        ex = jnp.where(valid[:, None], ex, 0.0)
    AtA = jnp.einsum("oki,okj->oij", A, A)     # [O,6,6]
    BtB = jnp.einsum("oki,okj->oij", B, B)     # [O,3,3]
    W = coeff * jnp.einsum("oki,okj->oij", A, B)  # [O,6,3]
    Atex = jnp.einsum("oki,ok->oi", A, ex)     # [O,6]
    Btex = jnp.einsum("oki,ok->oi", B, ex)     # [O,3]

    U = coeff * jax.ops.segment_sum(AtA, cam_idx, num_segments=n_cams)
    V = coeff * jax.ops.segment_sum(BtB, pt_idx, num_segments=n_pts)
    ga = coeff * jax.ops.segment_sum(Atex, cam_idx, num_segments=n_cams)
    gb = coeff * jax.ops.segment_sum(Btex, pt_idx, num_segments=n_pts)
    return U, V, W, ga, gb


def damp_uv(U, V, mu):
    """Add mu to every U/V diagonal entry (kern_update_UV,
    CL_files/update_UV.cl). Returns damped copies."""
    eye6 = jnp.eye(U.shape[-1], dtype=U.dtype)
    eye3 = jnp.eye(V.shape[-1], dtype=V.dtype)
    return U + mu * eye6, V + mu * eye3


def max_diag(U, V):
    """max over all U/V diagonal entries — seeds the initial LM damping
    mu = tau * max(diag) (levmar.cpp:115, sba_func.cpp:422-444)."""
    du = jnp.diagonal(U, axis1=-2, axis2=-1)
    dv = jnp.diagonal(V, axis1=-2, axis2=-1)
    return jnp.maximum(jnp.max(du), jnp.max(dv))
