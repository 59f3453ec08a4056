"""The flat, stackless BVH — the framework's *primary* representation.

The reference treats the pointer tree (``Bvh``) as primary and the flat
entry/exit layout (``FlatBvh``, ``src/flat_bvh.rs:17-54``) as a conversion "for
use in a shader" (``src/lib.rs:10-12``). On TPU that inversion is the whole
design: SoA node columns are what a batched, warp-free traversal kernel
consumes, so we build straight into this layout.

Layout invariants (depth-first, mirroring ``src/bvh/bvh_node.rs:136-143``):

* nodes are stored in DFS order: the left child of internal node ``i`` is
  ``i + 1``; the right child is ``exit[i + 1]`` (the left subtree's skip).
* ``entry[i]`` is the left-child index for internal nodes, ``LEAF`` (-1) for
  leaves (the reference uses ``u32::MAX``, ``src/flat_bvh.rs:30-38``).
* ``exit[i]`` is the skip pointer: the next DFS node after ``i``'s subtree.
  Traversal terminates when the cursor reaches ``num_nodes``.
* every node stores its own AABB (the reference stores child AABBs in the
  parent, ``src/bvh/bvh_node.rs:21-47`` — same data, transposed).
* ``parent`` (root = -1) is kept for refit and validators.

A BVH over n shapes has exactly ``2n - 1`` nodes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LEAF = -1  # entry value marking a leaf node


class FlatBvh(NamedTuple):
    """SoA node arrays; a pytree usable from host (numpy) or device (jnp)."""

    aabb_min: jnp.ndarray  # [N, D] node AABB lower corner
    aabb_max: jnp.ndarray  # [N, D] node AABB upper corner
    entry: jnp.ndarray  # [N] i32 left-child index, or LEAF
    exit: jnp.ndarray  # [N] i32 skip pointer (N terminates)
    shape: jnp.ndarray  # [N] i32 shape index at leaves, -1 at internal nodes
    parent: jnp.ndarray  # [N] i32 parent index, -1 at root

    @property
    def num_nodes(self) -> int:
        return self.entry.shape[0]

    @property
    def num_shapes(self) -> int:
        return (self.num_nodes + 1) // 2

    @property
    def ndim_space(self) -> int:
        return self.aabb_min.shape[-1]

    def is_leaf(self):
        return self.entry == LEAF

    def right_child(self):
        """Right child of internal node i is exit[i+1] (DFS layout)."""
        n = self.num_nodes
        left = np.clip(np.asarray(self.entry), 0, max(n - 1, 0))
        return np.asarray(self.exit)[left]

    def to_device(self, dtype=None) -> "FlatBvh":
        """Move node arrays onto the default JAX device."""
        def conv(x):
            x = jnp.asarray(x)
            if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(dtype)
            return x

        return FlatBvh(*(conv(x) for x in self))

    def to_host(self) -> "FlatBvh":
        return FlatBvh(*(np.asarray(x) for x in self))

    @staticmethod
    def empty(d: int = 3, dtype=np.float32) -> "FlatBvh":
        z = np.zeros((0, d), dtype)
        zi = np.zeros((0,), np.int32)
        return FlatBvh(z, z, zi, zi, zi, zi)

    def pretty_print(self, max_nodes: int = 64) -> str:
        """Indented tree dump (analog of reference pretty_print,
        ``src/bvh/bvh_impl.rs:244-275``)."""
        entry = np.asarray(self.entry)
        exit_ = np.asarray(self.exit)
        shape = np.asarray(self.shape)
        amin = np.asarray(self.aabb_min)
        amax = np.asarray(self.aabb_max)
        n = self.num_nodes
        lines: list[str] = []

        def rec(i: int, depth: int):
            if i >= n or len(lines) >= max_nodes:
                return
            pad = "  " * depth
            if entry[i] == LEAF:
                lines.append(f"{pad}shape\t{shape[i]}")
            else:
                left = entry[i]
                right = exit_[left]
                lines.append(f"{pad}{np.round(amin[i], 3)} {np.round(amax[i], 3)}")
                rec(left, depth + 1)
                rec(right, depth + 1)

        if n:
            rec(0, 0)
        return "\n".join(lines)


# NamedTuple is automatically a JAX pytree; no explicit registration needed.
