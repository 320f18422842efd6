"""Synthetic graph generators (fixtures + benchmark inputs).

Mirrors the reference's test fixtures (``test/generator.h:43-220``: identity,
random, upper-triangular, dense, circular-chain matrices) and adds an RMAT
generator for weak-scaling benchmarks (the reference ships none; RMAT is the
Graph500 standard).
"""

from __future__ import annotations

import numpy as np

from ..io.edgelist import EdgeList, edgelist_from_arrays
from ..io.transforms import remove_duplicate_edges

__all__ = [
    "identity_edgelist",
    "chain_edgelist",
    "circular_chain_edgelist",
    "random_edgelist",
    "upper_triangular_edgelist",
    "dense_edgelist",
    "rmat_edgelist",
]


def identity_edgelist(n: int, wdtype=np.int32) -> EdgeList:
    """n self loops with weight 1 (``generator.h`` identity matrix)."""
    ids = np.arange(1, n + 1, dtype=np.int32)
    return edgelist_from_arrays(ids, ids, np.ones(n, wdtype), m=n, n=n)


def chain_edgelist(n: int, wdtype=np.int32, weight=1) -> EdgeList:
    """Path graph 1→2→...→n."""
    src = np.arange(1, n, dtype=np.int32)
    return edgelist_from_arrays(src, src + 1,
                                np.full(n - 1, weight, wdtype), m=n, n=n)


def circular_chain_edgelist(n: int, wdtype=np.int32) -> EdgeList:
    """Ring 1→2→...→n→1 (``generator.h`` circular chain)."""
    src = np.arange(1, n + 1, dtype=np.int32)
    dst = np.concatenate([np.arange(2, n + 1), [1]]).astype(np.int32)
    return edgelist_from_arrays(src, dst, np.ones(n, wdtype), m=n, n=n)


def random_edgelist(n: int, avg_degree: int, seed: int = 0,
                    weight_range: int = 0, wdtype=np.int32) -> EdgeList:
    """~n*avg_degree random edges, duplicates removed, no self loops.

    ``weight_range > 0`` draws integer weights in [1, weight_range];
    otherwise all weights are 1.
    """
    rng = np.random.default_rng(seed)
    nnz = n * avg_degree
    src = rng.integers(1, n + 1, nnz).astype(np.int32)
    dst = rng.integers(1, n + 1, nnz).astype(np.int32)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if weight_range > 0:
        val = rng.integers(1, weight_range + 1, src.shape[0]).astype(wdtype)
    else:
        val = np.ones(src.shape[0], wdtype)
    e = edgelist_from_arrays(src, dst, val, m=n, n=n)
    return remove_duplicate_edges(e)


def upper_triangular_edgelist(n: int, wdtype=np.int32) -> EdgeList:
    """Complete DAG: edge (i, j) for every i < j."""
    src, dst = np.triu_indices(n, k=1)
    return edgelist_from_arrays(src.astype(np.int32) + 1,
                                dst.astype(np.int32) + 1,
                                np.ones(src.shape[0], wdtype), m=n, n=n)


def dense_edgelist(n: int, wdtype=np.int32) -> EdgeList:
    """Complete graph incl. self loops."""
    src, dst = np.mgrid[1:n + 1, 1:n + 1]
    return edgelist_from_arrays(src.ravel().astype(np.int32),
                                dst.ravel().astype(np.int32),
                                np.ones(n * n, wdtype), m=n, n=n)


def rmat_edgelist(scale: int, edge_factor: int = 16,
                  a: float = 0.57, b: float = 0.19, c: float = 0.19,
                  seed: int = 0, dedup: bool = True,
                  weight_range: int = 0, wdtype=np.int32,
                  native: bool | None = None) -> EdgeList:
    """Graph500-style RMAT: 2^scale vertices, ~edge_factor·2^scale edges.

    Vectorized recursive bisection: at each of ``scale`` levels every edge
    picks a quadrant with probabilities (a, b, c, 1-a-b-c).

    ``native=None`` (default) uses the C++/OpenMP generator when available
    (counter-based splitmix64 streams — deterministic for a given seed
    independent of thread count, ~20x faster at scale 20).  The native and
    numpy paths draw different RNG streams, so they produce *different*
    (same-distribution) graphs for the same seed; force ``native=False``
    to reproduce the numpy stream.
    """
    n = 1 << scale
    nnz = n * edge_factor
    if native is not False:
        e = _rmat_native(scale, nnz, a, b, c, seed, dedup, weight_range,
                         wdtype)
        if e is not None or native:
            if e is None:
                raise RuntimeError("native RMAT generator unavailable")
            return e
    rng = np.random.default_rng(seed)
    src = np.zeros(nnz, np.int64)
    dst = np.zeros(nnz, np.int64)
    ab = a + b
    c_norm = c / (1.0 - ab)
    # P(dst=1 | src=0) must be b/(a+b) — thresholding r2 against b/ab
    # instead of a/ab silently swapped the a and b quadrants, producing
    # RMAT(0.19, 0.57, ...) graphs: sender hubs intact but the diagonal
    # dominance (community structure) gone — scale-12 triangle count
    # 1.5K vs the correct ~500K, BFS radius ~24 vs ~7
    for _ in range(scale):
        r1 = rng.random(nnz)
        r2 = rng.random(nnz)
        src_bit = r1 > ab
        dst_bit = np.where(src_bit, r2 > c_norm, r2 > (a / ab))
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    keep = src != dst
    src, dst = src[keep] + 1, dst[keep] + 1
    if weight_range > 0:
        val = rng.integers(1, weight_range + 1, src.shape[0]).astype(wdtype)
    else:
        val = np.ones(src.shape[0], wdtype)
    e = edgelist_from_arrays(src.astype(np.int32), dst.astype(np.int32), val,
                             m=n, n=n)
    if dedup:
        e = remove_duplicate_edges(e)
    return e


def _rmat_native(scale, nnz, a, b, c, seed, dedup, weight_range, wdtype):
    from ..native import load_planner
    lib = load_planner()
    if lib is None or not hasattr(lib, "gm_rmat_gen"):
        return None
    src = np.empty(nnz, np.int32)
    dst = np.empty(nnz, np.int32)
    val = np.empty(nnz, np.int32)
    m = lib.gm_rmat_gen(scale, nnz, a, b, c, seed, int(dedup),
                        int(weight_range), src, dst, val)
    n = 1 << scale
    return edgelist_from_arrays(src[:m].copy(), dst[:m].copy(),
                                val[:m].astype(wdtype), m=n, n=n)
