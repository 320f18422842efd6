"""Debug / assert mode — the reference's ``debug=1`` build flag.

The reference's ``__DEBUG`` compiles in partition cross-checks and asserts
(``Makefile:22``, ``COOSIMD32Tile.h:320-362``, ``singlenode/spmspv.h:198-203``).
XLA kernels are race-free by construction, so the useful analog is
*plan-invariant validation*: set ``GRAPHMAT_DEBUG=1`` and every Pallas edge
plan is checked on the host right after construction — index ranges, block
monotonicity, slot-collision freedom, edge conservation — catching planner
bugs before they become silent wrong answers in a compiled kernel.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["debug_enabled", "validate_plan2", "validate_plan2m",
           "validate_planv", "assert_all_finite"]


def debug_enabled() -> bool:
    return os.environ.get("GRAPHMAT_DEBUG", "0") not in ("", "0", "false")


def _basic(plan, rcf):
    blk = np.asarray(plan.blkid)
    assert (np.diff(blk) >= 0).all(), "blkid must be nondecreasing"
    assert set(range(plan.nb)) <= set(blk.tolist()) or plan.nb == len(
        set(blk.tolist())), "every receiver block needs a chunk"
    base = np.asarray(plan.base)
    assert (base % 8 == 0).all(), "window bases must be 8-aligned"
    assert base.min() >= 0 and base.max() <= plan.h, "base out of range"
    assert rcf.min() >= 0 and rcf.max() <= plan.wr, "rcf out of range"
    kind = np.asarray(plan.kindid)
    assert kind.min() >= 0, "negative kind"


def validate_plan2(plan) -> None:
    """Invariants of the routed (v2r) scalar sum plan
    (``build_spmv2_plan``): packed-field ranges, slot conservation,
    per-(row, lane) registration uniqueness by construction, and that
    every real slot routes to a lane whose registration stays inside the
    chunk's gather range."""
    from ..ops.pallas_spmv2 import RCF_BITS
    u = np.asarray(plan.pk).view(np.uint32)
    rcf = (u & ((1 << RCF_BITS) - 1)).astype(np.int64)
    slo = ((u >> RCF_BITS) & 127).astype(np.int64)
    hi2 = (u >> 21).astype(np.int64)
    _basic(plan, rcf)
    # real-edge count == nnz (pads have rcf == wr)
    real = rcf < plan.wr
    assert real.sum() == plan.nnz, \
        f"slot conservation {real.sum()} != {plan.nnz}"
    # registration rows within each HALF's gather range (per-half windows)
    base2 = np.asarray(plan.base2)
    assert (base2 % 8 == 0).all() and base2.min() >= 0, "base2 misaligned"
    wtab = np.array([16] + list(plan.classes))
    half = plan.rows // 2
    wlen = np.empty_like(hi2)
    wlen[:, :half, :] = wtab[np.asarray(plan.kindid)][:, None, None]
    wlen[:, half:, :] = wtab[np.asarray(plan.kind2)][:, None, None]
    assert (hi2 < wlen).all(), "hi2 outside gather range"
    # every real slot's routing lane must carry a registration usable by
    # the gather (hi2 at (row, slo) in range — value equality is checked
    # end-to-end by the oracle tests)
    reg_at = np.take_along_axis(hi2, slo, axis=2)
    ok = reg_at < wlen
    assert ok[real].all(), "routing lane registration out of range"


def validate_plan2m(plan) -> None:
    """Invariants of the min/max (colored) plan (packed plane)."""
    from ..ops.pallas_spmv2 import RCF_BITS
    u = np.asarray(plan.pk).view(np.uint32)
    rcf = (u & ((1 << RCF_BITS) - 1)).astype(np.int64)
    _basic(plan, rcf)
    real = (rcf < plan.wr).sum()
    assert real == plan.nnz, f"slot conservation {real} != {plan.nnz}"


def validate_planv(plan) -> None:
    """Invariants of the K-wide vec2 plan (``build_spmv_vec2_plan``)."""
    from ..ops.pallas_spmv_vec2 import RCF_BITS, WYK
    blk = np.asarray(plan.blkid)
    assert (np.diff(blk) >= 0).all(), "blkid must be nondecreasing"
    sbase = np.asarray(plan.sbase)
    rbase = np.asarray(plan.rbase)
    assert (sbase % 8 == 0).all() and sbase.min() >= 0, "sbase misaligned"
    assert (rbase % 8 == 0).all(), "rbase must be 8-aligned"
    # per-chunk vp window stays inside the chunk's receiver block
    g = plan.wr // 4
    assert (rbase >= blk * g).all() and (rbase + WYK <= (blk + 1) * g).all(), \
        "vp window leaves the receiver block"
    pk = np.asarray(plan.pk)
    rcf = pk & ((1 << RCF_BITS) - 1)
    assert rcf.min() >= 0 and rcf.max() <= plan.wr, "rcf out of range"
    assert (pk >> RCF_BITS).min() >= 0, "negative gather index"
    # real-slot conservation over REAL chunks only (tile-pad chunks in
    # the python fallback carry zeros, not the rcf sentinel)
    lane = np.arange(pk.shape[2])
    cid = (np.arange(pk.shape[0])[:, None, None] * 32
           + (lane // 4)[None, None, :])
    real = int(((rcf < plan.wr) & (cid < plan.nc)).sum())
    assert real == plan.nnz, f"slot conservation {real} != {plan.nnz}"
    rcwt = np.asarray(plan.rcwt)
    assert rcwt.min() >= 0, "negative rcwt"
    assert ((rcwt < WYK) | (rcwt == 127)).all(), \
        "rcwt outside the WYK window"


def assert_all_finite(name: str, arr) -> None:
    a = np.asarray(arr)
    if not np.isfinite(a).all():
        raise AssertionError(f"{name} contains non-finite values")
