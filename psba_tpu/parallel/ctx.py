"""Mesh context: the single abstraction that makes the LM/TR solvers
mesh-polymorphic.

With `axis=None` every reduction is the identity and the solvers run
single-device. Inside `shard_map` over a mesh axis, `psum`/`pmax` become
ICI collectives. The solvers insert reductions exactly where the reference
crossed its device->host boundary for scalar reductions (SURVEY.md §1 data
flow) — which is also exactly the set of cross-shard dependencies:
U/ga/S/ea assembly, L2 norms/dots over the point-parameter shard, and the
max-diagonal damping seed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class MeshCtx(NamedTuple):
    axis: Optional[str] = None

    def psum(self, x):
        return jax.lax.psum(x, self.axis) if self.axis else x

    def pmax(self, x):
        return jax.lax.pmax(x, self.axis) if self.axis else x

    def pand(self, x):
        """Logical AND of a boolean scalar across shards (any shard's
        local failure flag fails the whole mesh-wide step)."""
        if not self.axis:
            return x
        import jax.numpy as jnp

        return jax.lax.psum(jnp.logical_not(x).astype(jnp.int32),
                            self.axis) == 0


NO_MESH = MeshCtx(None)
