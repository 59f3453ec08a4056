"""Framework configuration.

The reference hard-codes its tunables (``NUM_BUCKETS=6`` in
``src/bvh/bucket.rs:5``, rayon cutoff 64 in ``src/bvh/bvh_impl.rs:534``, stack
depth 32 in ``src/bvh/iter.rs:21``, merge threshold 0.3 in
``src/bvh/optimization.rs:114``). Here they are a real config object, as the
survey (§5) prescribes.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BvhConfig:
    # SAH build
    num_buckets: int = 6  # reference: src/bvh/bucket.rs:5
    bucket_scale_margin: float = 0.01  # bucket = rel_pos * (num_buckets - 0.01)
    # Packet-traversal-aware split tuning: penalize sibling overlap in the
    # SAH sweep by `overlap_penalty * n * SA(L intersect R) / SA(parent)`.
    # A shared-cursor packet must descend BOTH children whenever any ray
    # lands in their overlap, so overlap costs packet traversal visits that
    # per-ray SAH does not see. 0.0 (default) = the reference's exact cost
    # (bit-identical trees, native-builder parity); nonzero is numpy-path
    # only (build with use_native=False). MEASURED NEGATIVE on the cube
    # benchmark class (disjoint boxes have little overlap to penalize):
    # random wide iters/pkt 746 -> 760/772/816 at lam 0.25/0.5/1.0, aimed
    # flat, lam=2 degrades the tree past the wide-table budget
    # (scratch/overlap_penalty_cpu.py). Kept for overlap-heavy meshes.
    overlap_penalty: float = 0.0
    # LBVH build
    morton_bits: int = 21  # bits per axis (63-bit codes)
    # Traversal
    max_traversal_steps_factor: int = 4  # cap = factor * num_nodes (safety bound)
    hit_buffer_size: int = 64  # fixed-size candidate buffer for collecting traversals
    # Refit / incremental update
    merge_threshold: float = 0.3  # reference: src/bvh/optimization.rs:114
    # Numerics
    dtype: str = "float32"


DEFAULT_CONFIG = BvhConfig()
