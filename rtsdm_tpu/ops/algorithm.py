"""Utils.Algorithm analogues (reference Source/Falcor/Utils/Algorithm/).

The reference ships three GPU primitives as hand-written compute shaders —
ParallelReduction.h (tree reduction through staging buffers), PrefixSum.h
(two-level scan), BitonicSort.h (shared-memory bitonic network) — because
D3D12 has no primitive ops. On TPU these ARE single XLA ops that compile to
tuned reduction/scan/sort kernels; a hand-scheduled Pallas re-implementation
would only re-derive what the compiler already emits (SURVEY §7: don't
hand-schedule what XLA does). This module pins the mapping down as API,
with the reference's semantics (axis handling, payload sort, segment sums)
and unit tests (tests/test_utils_math.py) so the row is load-bearing rather
than implicit.

DirectedGraph.h + the DFS/topo traversal live in rendergraph/graph.py
(_execution_order) — the graph-compiler use of this family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def parallel_reduction(x, op: str = "sum", axis=None):
    """ParallelReduction.h:46 (Type::{Sum,MinMax}): one fused XLA reduce.
    op: 'sum' | 'min' | 'max' | 'minmax' (returns a (min, max) tuple)."""
    if op == "sum":
        return jnp.sum(x, axis=axis)
    if op == "min":
        return jnp.min(x, axis=axis)
    if op == "max":
        return jnp.max(x, axis=axis)
    if op == "minmax":
        return jnp.min(x, axis=axis), jnp.max(x, axis=axis)
    raise ValueError(f"unknown reduction '{op}'")


def prefix_sum(x, axis: int = -1, exclusive: bool = True):
    """PrefixSum.h:44 — the reference computes an EXCLUSIVE scan in-place
    (used for compaction offsets); XLA's associative_scan is the log-depth
    equivalent of its two-level group scan."""
    inc = jax.lax.associative_scan(jnp.add, x, axis=axis)
    if not exclusive:
        return inc
    return inc - x


def bitonic_sort(keys, values=None, axis: int = -1, descending: bool = False):
    """BitonicSort.h:41 — key(+payload) sort of fixed-size chunks; XLA's
    sort op is the network the shader builds by hand (and handles the
    payload like the reference's sortPayload path)."""
    if descending:
        if values is None:
            return -jnp.sort(-keys, axis=axis)
        k, v = jax.lax.sort_key_val(-keys, values, dimension=axis)
        return -k, v
    if values is None:
        return jnp.sort(keys, axis=axis)
    return jax.lax.sort_key_val(keys, values, dimension=axis)


def segment_sum(data, segment_ids, num_segments: int):
    """The scatter-add composite the reference builds from PrefixSum +
    reduction when histogramming (e.g. light tiles); jax.ops.segment_sum
    lowers to one scatter-add."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
