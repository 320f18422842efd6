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
           "validate_plan2u", "validate_planv", "assert_all_finite"]


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


def validate_plan2u(plan) -> None:
    """Invariants of the unified (v2u) plan: slot/registration checks
    plus full OUTPUT-ROUTING COVERAGE — every real slot must be consumed
    exactly once, either through its row's (gsel1, gsel2/has2) out-lane
    mapping with a matching receiver, or through a row-mode whole-row
    reduce.  This is the load-bearing check: a slot the out plane misses
    silently drops an edge in the compiled kernel."""
    from ..ops.pallas_spmv2 import RCF_BITS
    from ..ops.pallas_spmv2u import KB_KIND_SHIFT, SUBR
    u = np.asarray(plan.pk).view(np.uint32)
    rcf = (u & ((1 << RCF_BITS) - 1)).astype(np.int64)
    slo = ((u >> RCF_BITS) & 127).astype(np.int64)
    hi2 = (u >> 21).astype(np.int64)
    blk = np.asarray(plan.blkid)
    assert (np.diff(blk) >= 0).all(), "blkid must be nondecreasing"
    S = max(plan.rows // SUBR, 1)
    kb = np.asarray(plan.kb).view(np.uint32)
    kd = (kb >> KB_KIND_SHIFT) & 15
    bs = (kb & ((1 << 22) - 1)) << 3
    K = len(plan.classes)
    assert kd.max() <= 2 * K, "kind out of range"
    assert (bs % 8 == 0).all() and bs.max() <= plan.h, "base out of range"
    assert rcf.min() >= 0 and rcf.max() <= plan.wr, "rcf out of range"
    real = rcf < plan.wr
    assert real.sum() == plan.nnz, \
        f"slot conservation {real.sum()} != {plan.nnz}"
    # registration rows within each SUB's gather range (banded kinds
    # K+1..2K share their class's window length)
    wtab = np.array([16] + list(plan.classes) + list(plan.classes))
    wlen_sub = wtab[kd]                                  # [nc * S]
    wlen = np.repeat(wlen_sub, SUBR).reshape(
        plan.nc, plan.rows)[:, :, None]
    assert (hi2 < wlen).all(), "hi2 outside gather range"
    reg_at = np.take_along_axis(hi2, slo, axis=2)
    assert (reg_at < wlen)[real].all(), \
        "routing lane registration out of range"
    # banded subs: every consumed granule sits inside its tile's band
    if (kd > K).any():
        from ..ops.pallas_spmv2u import _band_ranges
        gsel_all = (reg_at >> 3).reshape(plan.nc * plan.rows // 8, 8,
                                         128)
        real_t = real.reshape(plan.nc * plan.rows // 8, 8, 128)
        kd_tile = np.repeat(kd, SUBR // 8)               # per 8-row tile
        tile_in_sub = np.tile(np.arange(SUBR // 8),
                              plan.nc * plan.rows // SUBR)
        for c in range(1, K + 1):
            sel = np.flatnonzero(kd_tile == K + c)
            if not len(sel):
                continue
            ranges = _band_ranges(plan.classes[c - 1])
            for t in sel:
                s0, w = ranges[tile_in_sub[t]]
                gs = gsel_all[t][real_t[t]]
                assert len(gs) == 0 or (
                    (gs >= s0) & (gs < s0 + w)).all(), \
                    "banded slot outside its tile band"
    o = np.asarray(plan.po).view(np.uint32)
    orcf = (o & ((1 << RCF_BITS) - 1)).astype(np.int64)
    g1 = ((o >> 21) & 127).astype(np.int64)
    g2 = ((o >> RCF_BITS) & 127).astype(np.int64)
    has2 = ((o >> 28) & 1).astype(np.int64)
    mode = ((o >> 29) & 1).astype(np.int64)
    nc, rows, lanes = rcf.shape
    real = rcf < plan.wr
    # row-mode rows: flag uniform across lanes, one receiver per row
    rm_row = mode[:, :, 0] == 1
    assert (mode == mode[:, :, :1]).all(), "row-mode flag not row-uniform"
    if rm_row.any():
        rr = orcf[rm_row]
        assert (rr == rr[:, :1]).all(), "row-mode rcf not row-uniform"
        srcf = rcf[rm_row]
        ok = ~((srcf < plan.wr) & (srcf != rr))
        assert ok.all(), "row-mode row holds foreign slots"
    # cold rows: every out-lane's gsels hit slots of that receiver; every
    # real slot referenced exactly once
    cold = ~rm_row
    refcnt = np.zeros_like(rcf)
    live = (orcf < plan.wr) & (mode == 0)
    idx = np.indices(rcf.shape)
    c_i, r_i = idx[0][live], idx[1][live]
    s1 = g1[live]
    s2 = g2[live]
    h2 = has2[live]
    tgt = orcf[live]
    assert (rcf[c_i, r_i, s1] == tgt).all(), "gsel1 receiver mismatch"
    assert (rcf[c_i, r_i, s2][h2 == 1]
            == tgt[h2 == 1]).all(), "gsel2 receiver mismatch"
    np.add.at(refcnt, (c_i, r_i, s1), 1)
    np.add.at(refcnt, (c_i[h2 == 1], r_i[h2 == 1], s2[h2 == 1]), 1)
    cold3 = np.broadcast_to(cold[:, :, None], rcf.shape)
    assert (refcnt[real & cold3] == 1).all(), \
        "cold slot not consumed exactly once"
    assert (refcnt[~real] == 0).all(), "pad slot referenced"


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
    # range-scatter encoding: lane b*32 + w holds lo | hi1 << 6 — slot
    # rows [lo, hi1) of block b's queue feed (wy-row w); ranges must be
    # well-formed and together consume exactly the real slots
    rcwt = np.asarray(plan.rcwt)
    lo = rcwt & 63
    hi1 = (rcwt >> 6) & 63
    assert rcwt.min() >= 0, "negative rcwt"
    assert (lo <= hi1).all() and hi1.max(initial=0) <= WYK, \
        "malformed slot range"
    nr8 = rcwt.shape[0]
    cid8 = (np.arange(nr8)[:, None, None] * 8
            + np.arange(8)[None, :, None])
    span = np.where(cid8 < plan.nc, hi1 - lo, 0)
    assert int(span.sum()) == plan.nnz, \
        f"range coverage {int(span.sum())} != {plan.nnz}"


def assert_all_finite(name: str, arr) -> None:
    a = np.asarray(arr)
    if not np.isfinite(a).all():
        raise AssertionError(f"{name} contains non-finite values")
