"""Pallas TPU generalized-SpMV "v2u" — unified routed layout for ⊕ in
{sum, min, max}.

Motivation (measured, PERF.md round-2): at RMAT-20 the v2r sum kernel's
MXU one-hot scatter runs at MXU peak yet costs 1.9 ms/iter — 8192 MACs
per edge just to route one value to one of 4096 block positions — while
the v2m min/max layout's receiver-lane-bound slots cap fill at 0.512
(partial-row waste 0.37), and ~0.38 µs/chunk of fixed pipeline cost makes
*chunk count* the dominant term for both.  v2u removes both walls with
one layout:

* **Slots are lane-free** (the v2r routed packing, fill-friendly):
  senders register their gather row at lane ``s & 127`` of ``hi2``; each
  slot routes its sender's value via ``slo`` — identical gather path to
  v2r (``pallas_spmv2.py``).

* **Scatter = output-side double-gather + VPU group loop.**  Each
  (row, out-lane) is bound to at most ONE receiver ``r`` with out-lane
  ``r & 127``, fed by up to K=2 of the row's slots through two more
  ``take_along_axis`` routes (``gsel1``/``gsel2``).  min/max duplicate
  the first slot when there is no second (idempotent); sum masks it with
  a ``has2`` bit.  The per-block accumulator update is then a masked
  per-group VPU reduction (measured 0.68 ms at 31 M slots) instead of
  the 67 M-MAC scatter matmul — and the sum path needs no bf16 splits:
  everything stays exact f32.

* **Row-mode rows** absorb in-cell in-degree hubs (reference analog: the
  heavy-row split of HybridTile, ``HybridTile.h:89-133``): the whole row
  belongs to one receiver, is reduced across lanes, and lands on the
  receiver's lane.  Without this a degree-d receiver would consume
  ceil(d/2) rows of out-lane capacity.

* **Chunks are ``rows`` sublanes split into 32-row SUB-WINDOWS**, each
  with its own gather window — rows=128 (default) packs four cells'
  worth of work per grid step, halving the ~0.35 µs/chunk fixed pipeline
  cost and the SMEM scalar footprint relative to rows=64 halves, at
  unchanged 32-row fill granularity.  Per-sub metadata rides ONE packed
  scalar stream ``kb = kind<<24 | prevchunk<<23 | same<<22 | base>>3``;
  the ``same``/``prevchunk`` bits encode the window-reuse chain at plan
  time (hub subs are transparent — they never touch the window scratch).
  Block-tail pad subs are HUB kind: a 2-granule walk instead of a full
  window walk.

* One plan now serves every ⊕ the engine knows (sum / min / max and the
  'or'/'any' mapping) — the pk/po/val planes are semiring-independent,
  so a graph builds ONE v2u plan per direction where it previously built
  separate v2r + v2m plans.

* **SMEM-budget grid segmentation**: the scalar-prefetch arrays must fit
  the 1 MB SMEM; beyond ``NC_SEG`` chunks the grid splits into several
  ``pallas_call``s cut at receiver-block boundaries (``_compute_splits``)
  — RMAT-23-class graphs overflow a single grid.

Plan streams per slot: ``pk = hi2<<21 | slo<<14 | rcf`` (v2r-compatible;
``rcf`` doubles as the pad/row-mode slot mask) and
``po = mode<<29 | has2<<28 | gsel1<<21 | gsel2<<14 | rcf_out`` — 8 bytes
plus 4 for ``val`` when the semiring reads edge values.

Reference provenance: the generalized SpMV loop these kernels replace is
``/root/reference/include/GMDP/singlenode/spmspv.h:39-86`` (DCSC hot
loop, arbitrary ⊕/⊗); the y-bitvector-in-the-multiply behaviour of
``want_got`` matches ``spmspv.h:64-81``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv2 import (HUB_GRANULES2, LANE, RCF_BITS, VMEM_X2_MAX_ROWS,
                           _classify, _identity_process, _round_up,
                           encode_sent_bit)

__all__ = ["Spmv2uPlan", "build_spmv2u_plan", "spmv2u"]

KIND_HUB = 0
ROWMODE_MIN_U = 129     # in-cell receiver degree that triggers row-mode
ROWMODE_KEEP_MIN = 64   # min slots for a rank row to stay row-mode
                        # (mirrored in planner.cpp kRowmodeKeepMin)
OUT_K = 2               # slots per (row, out-lane)
SUBR = 32               # rows per sub-window (fill granularity)
# kb packed scalar: bits [0,22) base>>3; bit 22 same-window-as-pred;
# bit 23 pred-is-in-previous-chunk; bits [24,28) kind; bit 29
# dense-pipeline freshness (sub must DMA its window — set when the
# ping-pong buffer for its position parity doesn't already hold it)
KB_SAME = 1 << 22
KB_PREV = 1 << 23
KB_KIND_SHIFT = 24
KB_PAD = 1 << 28      # sub is all-pad slots: never activates its chunk
KB_PIPE = 1 << 29
ACT_GRAN = 32         # activity-matrix granule rows (one sub-window)
ACT_GM_MAX_ENTRIES = 16_000_000   # ~32 MB bf16 cap for act_gm
# SMEM holds the scalar-prefetch arrays within a 1 MB budget; beyond
# this many chunks the grid splits into multiple pallas_calls at block
# boundaries (see _compute_splits)
NC_SEG = 24000


@dataclass
class Spmv2uPlan:
    n_pad: int
    n_send_pad: int
    h: int                # EXTENDED operand rows (h_src + aux.hc)
    wr: int
    nb: int
    nc: int
    hub: int
    nnz: int
    fill: float
    classes: tuple
    rows: int
    kb: Any               # i32[nc * S] packed per-sub window metadata
    blkid: Any            # i32[nc]  receiver block (nondecreasing)
    pk: Any               # i32[nc,rows,128] hi2<<21 | slo<<14 | rcf
    po: Any               # i32[nc,rows,128] mode<<29|has2<<28|g1<<21|g2<<14|rcf_out
    val: Any              # f32[nc,rows,128]
    got_static: Any
    eidx: Any = None      # host i32[nc,rows,128] slot -> edge index
    splits: tuple = ()    # ((c0, b0), ...) grid segments (SMEM budget)
    aux: Any = None       # CompactAux: hypersparse compaction (pallas_compact)
    h_src: int = 0        # source operand rows (= h when aux is None)
    act_lo: Any = None    # i32[nc*S] per-sub activity gather-range start
    act_hi: Any = None    # i32[nc*S] per-sub activity gather-range end
    act_gm: Any = None    # bf16[nc*S, ceil(h/ACT_GRAN)] granule overlap
    tb: Any = None        # host i32[nc*rows/16] per-tile granule spans (diag)


def _compute_splits(blkid_np, nb, nc_seg=NC_SEG):
    """Split the chunk grid into segments of <= nc_seg chunks, breaking
    only at receiver-block boundaries (each block's accumulator must
    stay within one pallas_call).  Returns ((c0, b0), ...)."""
    nc = len(blkid_np)
    if nc <= nc_seg:
        return ((0, 0),)
    starts = [(0, 0)]
    c0 = 0
    while nc - c0 > nc_seg:
        cut = c0 + nc_seg
        b = blkid_np[cut]
        while cut > c0 and blkid_np[cut - 1] == b:
            cut -= 1
        if cut == c0:
            raise ValueError(
                f"single receiver block spans > {nc_seg} chunks "
                f"(block {int(b)}); raise wr or nc_seg")
        starts.append((int(cut), int(blkid_np[cut])))
        c0 = cut
    return tuple(starts)


def _sort_rows_tile_bounds(plan):
    """Per-cell row sort by minimum consumed granule + per-tile span
    bounds (``plan.tb``, host-side).

    Rows within one cell are freely permutable: every row's out-routing
    is row-local (po's g1/g2 select lanes of the SAME row; row-mode
    reduces one row), all rows of a cell share the cell's gather
    window, and cells pad to SUBR-row sub boundaries — so sorting rows
    by minimum consumed granule makes each sub span as narrow a slice
    of its window as the layout permits.  Two uses:

    * the per-SUB spans (``_sub_gmin``/``_sub_gmax``) tighten the
      sparse-path activity ranges in ``_mark_pad_subs`` — a frontier
      touching only window rows no slot consumes no longer activates
      the sub (BFS chunk skipping).
    * ``plan.tb`` records per-TILE spans for plan diagnostics.

    NEGATIVE RESULT (measured, round 4): a kernel variant that walked
    only ``[glo, ghi)`` per tile via a traced fori_loop LOST 2-3x —
    the dynamic loop costs several times the static unrolled step, and
    spans stay wide anyway (mean 65.7 of 128 granules on a 16M-edge
    uniform graph) because slot lanes are pinned to ``sender & 127``,
    so the r-th-registration order statistics across 128 lanes spread
    every 8-row tile over most of its window.  The static class walk
    stays; flat graphs are served by smaller window classes instead
    (see ``build_spmv2u_plan``'s flat-cell acceptance rule).

    ``tb`` packing: word ``c*(ntiles/2) + t//2`` holds two tiles as
    (glo, span-1) byte pairs — granule indices < 256 since W <= 2048.
    All-pad tiles get (0, 0)."""
    S = max(plan.rows // SUBR, 1)
    nc = plan.nc
    nrows = nc * plan.rows
    kbu = np.asarray(plan.kb).view(np.uint32)
    kd_sub = ((kbu >> KB_KIND_SHIFT) & 15).astype(np.int64)
    base_sub = ((kbu & np.uint32((1 << 22) - 1)).astype(np.int64) << 3)
    blk_sub = np.repeat(np.asarray(plan.blkid, np.int64), S)

    pkr = np.asarray(plan.pk).reshape(nrows, LANE)
    gspan = getattr(plan, "_gspan", None)
    if gspan is not None:
        # computed by the native fill (gm_plan2u_gspan) — the numpy
        # recomputation below cost ~3 s at RMAT-20 (22.8M-row decode +
        # take_along_axis)
        gmin_r, gmax_r = gspan
        plan._gspan = None
    else:
        u = pkr.view(np.uint32)
        real = (u & np.uint32((1 << RCF_BITS) - 1)) != plan.wr
        # the granule a slot CONSUMES is its sender lane's REGISTRATION
        # (hi2 at lane slo), not the registration at the slot's own
        # lane — a registered lane is read through slo routing even
        # when its own slot position is a pad
        hi2 = (u >> 21).astype(np.int32)
        slo = ((u >> RCF_BITS) & (LANE - 1)).astype(np.int64)
        gsel = np.take_along_axis(hi2, slo, axis=1) >> 3
        BIG = np.int32(1 << 14)
        gmin_r = np.where(real, gsel, BIG).min(axis=1)
        gmax_r = np.where(real, gsel, -1).max(axis=1)

    # ---- per-cell stable row sort (window kinds only) ----
    # run id from consecutive (blk, kind, base) change: two adjacent
    # subs belong to the same cell iff all three match (cells are
    # contiguous in the sub stream by construction)
    ck = (blk_sub << 40) | (kd_sub << 34) | base_sub
    newc = np.r_[True, ck[1:] != ck[:-1]]
    run_sub = np.cumsum(newc) - 1                 # [nc*S] monotone
    row_run = np.repeat(run_sub, SUBR)
    # banded subs (kind > K) keep their tile-band row placement — the
    # kernel's static band walk depends on it
    K = len(plan.classes)
    row_sortable = np.repeat((kd_sub != KIND_HUB) & (kd_sub <= K), SUBR)
    idx = np.flatnonzero(row_sortable)
    if len(idx):
        order = np.lexsort((gmin_r[idx], row_run[idx]))
        src = idx[order]
        if not np.array_equal(src, idx):
            perm = np.arange(nrows)
            perm[idx] = src
            sh = (nc, plan.rows, LANE)
            plan.pk = np.ascontiguousarray(pkr[perm].reshape(sh))
            plan.po = np.ascontiguousarray(
                np.asarray(plan.po).reshape(nrows, LANE)[perm].reshape(sh))
            plan.val = np.ascontiguousarray(
                np.asarray(plan.val).reshape(nrows, LANE)[perm].reshape(sh))
            if getattr(plan, "eidx", None) is not None:
                plan.eidx = np.ascontiguousarray(
                    np.asarray(plan.eidx).reshape(nrows, LANE)[perm]
                    .reshape(sh))
            gmin_r = gmin_r[perm]
            gmax_r = gmax_r[perm]

    # ---- packed per-tile bounds ----
    tmin = gmin_r.reshape(-1, 8).min(axis=1)      # [nc * ntiles]
    tmax = gmax_r.reshape(-1, 8).max(axis=1)
    empty_t = tmax < 0
    glo = np.where(empty_t, 0, tmin).astype(np.uint32)
    sp1 = np.where(empty_t, 0, tmax - np.where(empty_t, 0, tmin)
                   ).astype(np.uint32)
    assert glo.max(initial=0) <= 255 and sp1.max(initial=0) <= 255
    w = (glo[0::2] | (sp1[0::2] << 8)
         | (glo[1::2] << 16) | (sp1[1::2] << 24))
    plan.tb = np.ascontiguousarray(w.view(np.int32))

    plan._sub_gmin = gmin_r.reshape(-1, SUBR).min(axis=1)   # [nc*S]
    plan._sub_gmax = gmax_r.reshape(-1, SUBR).max(axis=1)
    return plan


def _mark_pad_subs(plan):
    """Set KB_PAD on subs whose slots are ALL pads (block-tail pads,
    empty-block coverage): they contribute the exact identity, so the
    sparse activity test must never let them activate a chunk.  Without
    this, pads — emitted as cheap HUB subs — made every chunk active
    whenever any x2 row in [0, 16) was (measured: a single-hub frontier
    paid the FULL kernel, 2.28 vs 2.34 ms dense at RMAT-20; PERF r4).

    Also precomputes the per-sub gather-range index pair
    ``(act_lo, act_hi)`` the sparse activity test uses: sub j is active
    iff any x2 row in ``[act_lo[j], act_hi[j])`` is (pad subs get the
    empty range).  Folding the kind/base decode + pad mask to plan time
    turns the per-iteration activity test into two prefix-sum takes —
    the decode chain was ~6 extra XLA launches per direction per
    iteration inside the BFS while_loop (PERF round 4)."""
    kb = np.asarray(plan.kb).view(np.uint32).copy()
    pk = np.asarray(plan.pk)
    S = max(plan.rows // SUBR, 1)
    empty = (pk.reshape(plan.nc * S, SUBR * LANE)
             == plan.wr).all(axis=1)
    kb[empty] |= np.uint32(KB_PAD)
    plan.kb = kb.view(np.int32)
    wtab = np.array([16] + list(plan.classes) + list(plan.classes),
                    np.int64)
    kd = (kb >> KB_KIND_SHIFT) & 15
    bs = ((kb & ((1 << 22) - 1)) << 3).astype(np.int64)
    lo = np.where(kd == 0, 0, bs)
    hi = np.minimum(lo + wtab[kd], plan.h)
    gmin = getattr(plan, "_sub_gmin", None)
    if gmin is not None:
        # tighten to the sub's REAL slot granule span (computed by
        # _sort_rows_tile_bounds): rows outside it are never gathered,
        # so a frontier touching only them must not activate the sub
        gmax = plan._sub_gmax
        have = gmax >= 0
        lo_t = lo + 8 * np.clip(gmin, 0, 1 << 13)
        hi_t = np.minimum(lo + 8 * (gmax.astype(np.int64) + 1), hi)
        lo = np.where(have, np.minimum(lo_t, hi_t), lo)
        hi = np.where(have, hi_t, hi)
    pad = (kb & np.uint32(KB_PAD)) != 0
    lo[pad] = 0
    hi[pad] = 0
    plan.act_lo = lo.astype(np.int32)
    plan.act_hi = hi.astype(np.int32)
    # granule-overlap activity matrix: a TPU 1D gather costs ~26 ns PER
    # INDEX (measured: 153 us for the 5816-sub take at RMAT-20), so the
    # sparse path's activity test replaces its gathers with one matmul
    # against this plan-static multi-hot matrix over ACT_GRAN-row
    # granules: sub j is active iff any granule overlapping its gather
    # range holds an active row.  Skipped above ACT_GM_MAX_ENTRIES —
    # large plans amortize the gather cost over a much bigger kernel.
    ngran = -(-plan.h // ACT_GRAN)
    if len(kb) * ngran <= ACT_GM_MAX_ENTRIES:
        glo = lo // ACT_GRAN
        ghi = np.maximum((hi + ACT_GRAN - 1) // ACT_GRAN, glo)
        m = np.zeros((len(kb), ngran + 1), np.int8)
        np.add.at(m, (np.arange(len(kb)), glo), 1)
        np.add.at(m, (np.arange(len(kb)), ghi), -1)
        m[pad] = 0
        gm = np.cumsum(m[:, :-1], axis=1) > 0   # bool [nsub, ngran]
        plan.act_gm = np.ascontiguousarray(gm)  # uploaded as bf16
    else:
        plan.act_gm = None
    return plan


def _apply_splits(plan):
    """Finalize a freshly built plan: upload the (numpy) planes to
    device, split per grid segment first when the grid must split (SMEM
    budget) — slicing inside jit would copy the multi-GB plan planes
    every iteration (and double peak HBM), so the split happens once on
    the host.  Per-segment blkid is stored already rebased to the
    segment's first block."""
    plan = _mark_pad_subs(_sort_rows_tile_bounds(plan))
    if len(plan.splits) <= 1:
        plan.kb = jnp.asarray(_add_pipeline_bits(
            plan.kb, max(plan.rows // SUBR, 1)))
        plan.blkid = jnp.asarray(plan.blkid)
        plan.pk = jnp.asarray(plan.pk)
        plan.po = jnp.asarray(plan.po)
        plan.val = jnp.asarray(plan.val)
        plan.act_lo = jnp.asarray(plan.act_lo)
        plan.act_hi = jnp.asarray(plan.act_hi)
        if plan.act_gm is not None:
            plan.act_gm = jnp.asarray(plan.act_gm, jnp.bfloat16)
        return plan
    S = max(plan.rows // SUBR, 1)
    segs = plan.splits
    bounds = [(segs[k][0], segs[k][1],
               segs[k + 1][0] if k + 1 < len(segs) else plan.nc)
              for k in range(len(segs))]
    kb = np.asarray(plan.kb)
    blk = np.asarray(plan.blkid)
    pk = np.asarray(plan.pk)
    po = np.asarray(plan.po)
    val = np.asarray(plan.val)
    # pipeline freshness per SEGMENT (each pallas_call starts with cold
    # buffers)
    plan.kb = tuple(jnp.asarray(_add_pipeline_bits(kb[c0 * S:c1 * S], S))
                    for (c0, b0, c1) in bounds)
    plan.blkid = tuple(jnp.asarray(blk[c0:c1] - b0)
                       for (c0, b0, c1) in bounds)
    plan.pk = tuple(jnp.asarray(pk[c0:c1]) for (c0, b0, c1) in bounds)
    plan.po = tuple(jnp.asarray(po[c0:c1]) for (c0, b0, c1) in bounds)
    plan.val = tuple(jnp.asarray(val[c0:c1]) for (c0, b0, c1) in bounds)
    alo = np.asarray(plan.act_lo)
    ahi = np.asarray(plan.act_hi)
    plan.act_lo = tuple(jnp.asarray(alo[c0 * S:c1 * S])
                        for (c0, b0, c1) in bounds)
    plan.act_hi = tuple(jnp.asarray(ahi[c0 * S:c1 * S])
                        for (c0, b0, c1) in bounds)
    if plan.act_gm is not None:
        agm = np.asarray(plan.act_gm)
        plan.act_gm = tuple(jnp.asarray(agm[c0 * S:c1 * S], jnp.bfloat16)
                            for (c0, b0, c1) in bounds)
    return plan


def _add_pipeline_bits(kb_np: np.ndarray, nbuf: int) -> np.ndarray:
    """Set the KB_PIPE freshness bit for the dense pipelined window
    loads: window subs rotate over ``nbuf`` wscr buffers by POSITION
    (buffer = sub-in-chunk index, a static offset), so a sub skips its
    DMA only when its buffer already holds its window (hub subs are
    transparent).  Measured motivation (PERF round 3): the synchronous
    per-sub window DMA cost 21 of 45.8 ms at RMAT-23; with nbuf buffers
    the issue runs nbuf-1 subs ahead, keeping several transfers in
    flight to saturate HBM bandwidth under the granule walk."""
    kb = np.asarray(kb_np).view(np.uint32).copy()
    last = [None] * nbuf
    for j in range(len(kb)):
        w = int(kb[j])
        kd = (w >> KB_KIND_SHIFT) & 15
        if kd == KIND_HUB:
            continue
        key = (kd, w & ((1 << 22) - 1))
        b = j % nbuf
        if last[b] != key:
            kb[j] = np.uint32(w | KB_PIPE)
            last[b] = key
    return kb.view(np.int32)


def _pack_kb(subs, S):
    """Flattened sub list [(kind, base)] -> packed kb int32 array with
    the window-reuse chain bits.  Hub subs are transparent to the chain
    (they never write the window scratch); ``same`` only survives when
    the predecessor sub lives in the same or the immediately previous
    chunk (the kernel gates the cross-chunk case on that chunk's
    activity in sparse mode)."""
    kb = np.zeros(len(subs), np.uint32)
    last = None   # (kind, base, sub index) of last non-hub sub
    for j, (kd, bs) in enumerate(subs):
        w = (np.uint32(kd) << KB_KIND_SHIFT) | np.uint32(bs >> 3)
        if kd != KIND_HUB:
            if last is not None and last[0] == kd and last[1] == bs:
                pred_chunk, my_chunk = last[2] // S, j // S
                if my_chunk - pred_chunk <= 1:
                    w |= KB_SAME
                    if pred_chunk == my_chunk - 1:
                        w |= KB_PREV
            last = (kd, bs, j)
        kb[j] = w
    return kb.view(np.int32)


def _pack_u_cell(sv, rv, vv, gv, iv, blk, wr, rowmode_min=ROWMODE_MIN_U):
    """Pack one cell's edges (sender-sorted) into v2u rows.

    Returns (cold_rows, rm_rows); python reference packer — small cells
    only; the native planner (planner.cpp gm_plan2u_*) handles
    production sizes."""
    lanes = (sv & (LANE - 1)).astype(np.int64)
    rlanes = (rv & (LANE - 1)).astype(np.int64)
    rcfv = (rv - blk * wr).astype(np.int64)

    ur, cnt = np.unique(rv, return_counts=True)
    hotset = set(ur[cnt >= rowmode_min].tolist())
    hot = (np.isin(rv, list(hotset)) if hotset
           else np.zeros(len(rv), bool))

    rm_rows = []
    spill = []
    if hotset:
        for r0 in sorted(hotset):
            m = rv == r0
            idxs = np.flatnonzero(m)
            # senders must register at distinct lanes within a row:
            # row index = per-sender-lane running count.  Keep only
            # rank rows >= ROWMODE_KEEP_MIN slots (lane-collision order
            # statistics make higher ranks nearly empty — measured 0.37
            # avg fill on a true RMAT-20); the rest spill to the cold
            # routed pack, which mixes receivers at ~0.88 fill
            cnt2: dict = {}
            buckets: dict = {}
            for j in idxs:
                L = int(lanes[j])
                k = cnt2.get(L, 0)
                cnt2[L] = k + 1
                buckets.setdefault(k, []).append(j)
            R = 0
            while R in buckets and len(buckets[R]) >= ROWMODE_KEEP_MIN:
                R += 1
            for k in sorted(buckets):
                if k >= R:
                    spill.extend(buckets[k])
                    continue
                grp = buckets[k]
                slots = [(sl, int(lanes[j]), int(gv[j]), int(rcfv[j]),
                          float(vv[j]), int(iv[j]))
                         for sl, j in enumerate(grp)]
                reg = {int(lanes[j]): int(gv[j]) for j in grp}
                rm_rows.append({"slots": slots,
                                "rm_rcf": int(rcfv[idxs[0]]),
                                "reg": reg})

    cold_rows = []

    def row_ok(row, L, gx, Lr, r0):
        if len(row["slots"]) >= LANE:
            return False
        reg = row["reg"]
        if L in reg and reg[L] != gx:
            return False
        out = row["out"]
        if Lr in out:
            orcf, sl = out[Lr]
            if orcf != r0 or len(sl) >= OUT_K:
                return False
        return True

    order = np.concatenate([np.flatnonzero(~hot),
                            np.asarray(spill, np.int64)]) \
        if spill else np.flatnonzero(~hot)
    for j in order:
        L, gx = int(lanes[j]), int(gv[j])
        Lr, r0 = int(rlanes[j]), int(rcfv[j])
        placed = False
        for row in cold_rows:
            if row_ok(row, L, gx, Lr, r0):
                placed = True
                break
        if not placed:
            row = {"slots": [], "reg": {}, "out": {}}
            cold_rows.append(row)
        slot = len(row["slots"])
        row["slots"].append((slot, L, gx, r0, float(vv[j]), int(iv[j])))
        row["reg"][L] = gx
        row["out"].setdefault(Lr, (r0, []))[1].append(slot)
    return cold_rows, rm_rows


BAND_EXTRA = 4   # band overlap granules (mirrored in planner.cpp)


def _band_ranges(W):
    """Banded-walk geometry (kept in lockstep with planner.cpp
    ``band_ranges``): tile k of every sub walks only granules
    [start_k, start_k + wgb) of the W-row window.  Band width is HALF
    the window (not Wg/stiles + slack): narrow bands leave the two edge
    bands with wide exclusive granule ranges that cannot rebalance, and
    the per-band lane-max row count blows past one 8-row tile level
    (measured fill 0.26 vs 0.44 baseline at Wg/4+4)."""
    stiles = SUBR // 8
    Wg = W // 8
    # small windows (dense flat cells ~2K edges) need wide bands: the
    # per-band lane-max row count spills past one 8-row tile level
    # otherwise (measured fill 0.26 at Wg/4+4).  Large windows hold the
    # sparse remainder cells (small populations, no spill risk) and
    # dominate the walk at 512-1024 takes/sub — narrow bands there.
    wgb = min(Wg, max(Wg // 2, Wg // stiles + BAND_EXTRA))
    if stiles == 1 or Wg == wgb:
        return tuple((0, wgb) for _ in range(stiles))
    return tuple(
        ((k * (Wg - wgb) * 2 + (stiles - 1)) // (2 * (stiles - 1)), wgb)
        for k in range(stiles))


def _pack_u_cold(sv, rv, vv, gv, iv, blk, wr):
    """The routed cold-row greedy from ``_pack_u_cell`` without hot
    extraction (helper for the banded pack)."""
    lanes = (sv & (LANE - 1)).astype(np.int64)
    rlanes = (rv & (LANE - 1)).astype(np.int64)
    rcfv = (rv - blk * wr).astype(np.int64)
    rows = []
    for j in range(len(sv)):
        L, gx = int(lanes[j]), int(gv[j])
        Lr, r0 = int(rlanes[j]), int(rcfv[j])
        row = None
        for cand in rows:
            if len(cand["slots"]) >= LANE:
                continue
            reg = cand["reg"]
            if L in reg and reg[L] != gx:
                continue
            out = cand["out"]
            if Lr in out:
                orcf, sl = out[Lr]
                if orcf != r0 or len(sl) >= OUT_K:
                    continue
            row = cand
            break
        if row is None:
            row = {"slots": [], "reg": {}, "out": {}}
            rows.append(row)
        slot = len(row["slots"])
        row["slots"].append((slot, L, gx, r0, float(vv[j]), int(iv[j])))
        row["reg"][L] = gx
        row["out"].setdefault(Lr, (r0, []))[1].append(slot)
    return rows


def _pack_u_cell_banded(sv, rv, vv, gv, iv, blk, wr, W,
                        rowmode_min=ROWMODE_MIN_U):
    """Banded pack for a flat cell: partition edges into per-tile
    granule bands (greedy 2-choice over the overlapping coverage), pack
    each band's rows independently, and place band k's rows at tile
    position k of consecutive subs.  Returns a row list padded to
    32*nsubs (``None`` = pad row), or ``None`` when a row-mode-hot
    receiver disqualifies the cell (falls back to the normal pack)."""
    if len(rv):
        _, cnt = np.unique(rv, return_counts=True)
        if cnt.max() >= rowmode_min:
            return None
    ranges = _band_ranges(W)
    stiles = len(ranges)
    g = (np.asarray(gv) >> 3).astype(np.int64)
    # 2-choice on the binding loads (max of per-sender-lane and
    # per-out-lane occupancy — see planner.cpp band assignment)
    sload = np.zeros((stiles, LANE), np.int64)
    rload = np.zeros((stiles, LANE), np.int64)
    lanes = (np.asarray(sv) & (LANE - 1)).astype(np.int64)
    rlanes = (np.asarray(rv) & (LANE - 1)).astype(np.int64)
    # pass 1 assigns single-candidate (exclusive-granule) edges so the
    # shared-region balancing sees the forced loads; otherwise the
    # granule-sorted arrival front-loads early bands and the last
    # band's exclusive tail lands on top of an unbalanced base
    bcnt = np.zeros(stiles, np.int64)
    bandof = np.zeros(len(sv), np.int64)
    cands = [[k for k, (s0, w) in enumerate(ranges) if s0 <= gj < s0 + w]
             or [min(int(gj) * stiles // max(W // 8, 1), stiles - 1)]
             for gj in g]
    order = sorted(range(len(sv)), key=lambda j: (len(cands[j]), j))
    for j in order:
        best, bestc = -1, (0, 0, 0)
        for k in cands[j]:
            ml = max(sload[k, lanes[j]], rload[k, rlanes[j]])
            # a band at 8 rows of lane load would spill the whole cell
            # into a second, mostly-empty sub level: treat >= 8 as a
            # last resort
            c = (1 if ml >= 8 else 0, ml, bcnt[k])
            if best < 0 or c < bestc:
                best, bestc = k, c
        bandof[j] = best
        sload[best, lanes[j]] += 1
        rload[best, rlanes[j]] += 1
        bcnt[best] += 1
    band_rows = []
    for k in range(stiles):
        sel = np.flatnonzero(bandof == k)
        band_rows.append(_pack_u_cold(sv[sel], rv[sel], vv[sel],
                                      gv[sel], iv[sel], blk, wr))
    nsubs = max([1] + [-(-len(rk) // 8) for rk in band_rows])
    if nsubs > 1:
        # per-cell fallback (mirrors planner.cpp): banded only when it
        # costs no extra sub levels vs the normal routed pack
        norm = _pack_u_cold(sv, rv, vv, gv, iv, blk, wr)
        if -(-len(norm) // SUBR) < nsubs:
            return None
    out = [None] * (nsubs * SUBR)
    for k, rk in enumerate(band_rows):
        for j, row in enumerate(rk):
            out[(j // 8) * SUBR + k * 8 + j % 8] = row
    return out


def _emit_u_row(row, wr, rowmode=False):
    """Row dict -> (pk[128], po[128], val[128], idx[128]) int32/float32."""
    pk = np.full(LANE, wr, np.int32)
    po = np.full(LANE, wr, np.int32)
    vl = np.zeros(LANE, np.float32)
    ix = np.full(LANE, -1, np.int32)
    for (slot, L, gx, rcf, v, ei) in row["slots"]:
        pk[slot] = np.int32(
            (np.uint32(0) << 21) | (np.uint32(L) << RCF_BITS)
            | np.uint32(rcf))
        vl[slot] = v
        ix[slot] = ei
    for L, gx in row["reg"].items():
        pk[L] = np.int32(np.uint32(pk[L]) | (np.uint32(gx) << 21))
    if rowmode:
        po[:] = np.int32(np.uint32(1 << 29) | np.uint32(row["rm_rcf"]))
    else:
        for Lr, (rcf, slots) in row["out"].items():
            g1 = slots[0]
            g2 = slots[1] if len(slots) > 1 else g1
            has2 = 1 if len(slots) > 1 else 0
            po[Lr] = np.int32((np.uint32(has2) << 28)
                              | (np.uint32(g1) << 21)
                              | (np.uint32(g2) << RCF_BITS)
                              | np.uint32(rcf))
    return pk, po, vl, ix


def build_spmv2u_plan(senders0: np.ndarray, receivers0: np.ndarray,
                      vals: np.ndarray, n: int, n_recv: int | None = None,
                      wr: int = 4096, hub: int = 2048,
                      windows=(160, 256, 1024, 2048),
                      cell_min: int = 4000, rows: int = 128,
                      rowmode_min: int = ROWMODE_MIN_U,
                      compact: Any = "auto",
                      compact_kw: dict | None = None,
                      flat_min: int = 1536,
                      flat_w_min: int = 200,
                      flat_w_max: int = 384) -> Spmv2uPlan:
    """Pack a 0-based COO edge list into the v2u routed/out-gather layout.

    ``compact``: hypersparse operand compaction (the DCSC analog,
    ``ops/pallas_compact.py``) — ``"auto"`` enables it beyond
    ``H_COMPACT_MIN`` source rows (overridable via ``GRAPHMAT_COMPACT``
    =0/1), ``True``/``False`` force.  Diverted straggler edges gather
    from per-super-block compacted operand rows appended after the real
    operand; the kernel itself is unchanged.

    ``flat_min``/``flat_w_min``/``flat_w_max``: flat-degree acceptance
    rule — a cell is accepted at a window class ``flat_w_min <= W <=
    flat_w_max`` already at ``flat_min`` edges (vs ``cell_min``
    elsewhere).  A hub-free flat degree distribution (uniform-random
    graphs) spreads every cell below ``cell_min`` at the small
    windows, which used to push ALL its edges into the W=1024 class
    and its 128-granule walk: measured 3.30 -> 2.74 ms/iter (sum
    kernel, 16M-edge uniform, one v5e chip).  A ~40%-full sub at
    W=256 costs 32 granule walks + pad slots; the same cell merged
    into a W=1024 cell costs 128 walks — the crossover sits near fill
    0.375, i.e. 1536 of 4096 slots.  W=160 is EXCLUDED from the rule
    (``flat_w_min``): its 20-vs-32 walk saving does not cover the same
    fill loss (same-session A/B 2.89 vs 2.74 ms; PERF round 4).
    RMAT-20 is unchanged under the rule (1.91 vs 1.92 ms)."""
    if n_recv is None:
        n_recv = n
    h = max(_round_up(_round_up(n, LANE) // LANE, LANE), LANE)
    h_src = h
    n_send_pad = h * LANE
    n_pad = max(_round_up(n_recv, wr), wr)
    nb = n_pad // wr
    e = len(senders0)
    assert wr <= (1 << RCF_BITS) - 1
    assert rows % SUBR == 0 or rows == SUBR
    S = max(rows // SUBR, 1)

    s = np.asarray(senders0, np.int64)
    r = np.asarray(receivers0, np.int64)
    v = np.asarray(vals, np.float32)
    hub = int(min(hub, 16 * LANE))

    from .pallas_compact import H_COMPACT_MIN, divert_stragglers
    import os
    env_c = os.environ.get("GRAPHMAT_COMPACT")
    if env_c is not None and compact == "auto":
        # the env knob only resolves the "auto" default: an explicit
        # True/False caller (e.g. dist tile builds, whose stacked plans
        # manage aux planes themselves) must not be silently rewritten —
        # that used to surface later as a cryptic reshape-size mismatch
        compact = env_c not in ("0", "")
    if compact == "auto":
        compact = h_src >= H_COMPACT_MIN
    aux = None
    if compact and e > 0:
        ckw = dict(compact_kw or {})
        ckw.setdefault("w_aux", min(1024, h_src))
        s, aux, h = divert_stragglers(s, r, n_pad, wr, h_src, hub,
                                      rows=rows, **ckw)
    norm_windows = sorted({int(min(w, h)) for w in windows}) or [min(2048, h)]
    assert max(norm_windows) <= 2048
    # flat-degree acceptance: small windows accept cells at flat_min
    cell_mins = [min(cell_min, flat_min)
                 if flat_w_min <= w <= flat_w_max else cell_min
                 for w in norm_windows]

    # banded-walk classes: every window class may pack cells in
    # per-tile granule bands so the kernel walks a band instead of the
    # full window (the walk is ~40% of uniform kernel time, and the
    # big-window remainder classes pay 512-1024 takes/sub).  Cells
    # where banding would cost an extra sub level (lane collisions in
    # band-exclusive granules) or that carry row-mode-hot receivers
    # fall back to the normal pack per cell.
    banded_cls = [1] * len(norm_windows)

    from ..native import load_planner
    lib = load_planner()
    if (lib is not None and e > 0 and hasattr(lib, "gm_plan2u_create")):
        return _build_plan2u_native(
            lib, s, r, v, e, h, wr, nb, hub, norm_windows, cell_mins,
            n_pad, n_send_pad, receivers0, rows, rowmode_min,
            aux=aux, h_src=h_src, banded_cls=banded_cls)

    rblk = r // wr
    kind, cellk, basew, gidx = _classify(s, r, rblk, h, nb, wr, hub,
                                         norm_windows, cell_mins)
    order = np.lexsort((s, cellk, kind, rblk))
    so, ro, vo, go = s[order], r[order], v[order], gidx[order]
    ko, co, bo, blko = kind[order], cellk[order], basew[order], rblk[order]
    io = order.astype(np.int32)

    # pack per cell -> (blk, kind, base, [(pk, po, val, idx) rows])
    K = len(norm_windows)
    pad_row = {"slots": [], "reg": {}, "out": {}}
    cells_rows = []
    cb = np.r_[0, np.flatnonzero(co[1:] != co[:-1]) + 1, e] if e \
        else np.zeros(1, np.int64)
    for gi in range(len(cb) - 1):
        lo, hi_ = int(cb[gi]), int(cb[gi + 1])
        blk = int(blko[lo])
        kd = int(ko[lo])
        if kd > 0 and banded_cls[kd - 1]:
            rws_b = _pack_u_cell_banded(
                so[lo:hi_], ro[lo:hi_], vo[lo:hi_], go[lo:hi_],
                io[lo:hi_], blk, wr, norm_windows[kd - 1], rowmode_min)
            if rws_b is not None:
                rws = [_emit_u_row(rw if rw is not None else pad_row, wr)
                       for rw in rws_b]
                cells_rows.append((blk, kd + K, int(bo[lo]), rws))
                continue
        cold, rm = _pack_u_cell(so[lo:hi_], ro[lo:hi_], vo[lo:hi_],
                                go[lo:hi_], io[lo:hi_], blk, wr,
                                rowmode_min)
        rws = ([_emit_u_row(rw, wr) for rw in cold]
               + [_emit_u_row(rw, wr, rowmode=True) for rw in rm])
        cells_rows.append((blk, kd, int(bo[lo]), rws))

    # sub-window assembly: cells split into SUBR-row subs; blocks pad to
    # a multiple of S subs with cheap HUB pads; S subs form one chunk
    sub_meta = []          # (kind, base) per sub
    sub_rows = []          # row list per sub
    blk_c = []
    ci = 0
    for b in range(nb):
        nsub0 = len(sub_meta)
        while ci < len(cells_rows) and cells_rows[ci][0] == b:
            _, kd, bs, rws = cells_rows[ci]
            for off in range(0, max(len(rws), 1), SUBR):
                sub_meta.append((kd, bs))
                sub_rows.append(rws[off:off + SUBR])
            ci += 1
        if len(sub_meta) == nsub0:       # empty-block coverage
            sub_meta.append((KIND_HUB, 0))
            sub_rows.append([])
        while (len(sub_meta) - nsub0) % S:
            sub_meta.append((KIND_HUB, 0))   # cheap 2-granule pad
            sub_rows.append([])
        blk_c += [b] * ((len(sub_meta) - nsub0) // S)

    nc = len(sub_meta) // S
    chunks_pk = np.full((nc, rows, LANE), wr, np.int32)
    chunks_po = np.full((nc, rows, LANE), wr, np.int32)
    chunks_val = np.zeros((nc, rows, LANE), np.float32)
    chunks_idx = np.full((nc, rows, LANE), -1, np.int32)
    for j, rws in enumerate(sub_rows):
        c, sub = j // S, j % S
        for ri, (prow, orow, vrow, irow) in enumerate(rws):
            rr = sub * SUBR + ri
            chunks_pk[c, rr] = prow
            chunks_po[c, rr] = orow
            chunks_val[c, rr] = vrow
            chunks_idx[c, rr] = irow

    got = np.zeros(n_pad, bool)
    if e:
        got[np.unique(np.asarray(receivers0))] = True
    blk_np = np.asarray(blk_c, np.int32)
    return _apply_splits(_maybe_validate_u(Spmv2uPlan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(norm_windows), rows=rows,
        splits=_compute_splits(blk_np, nb),
        kb=_pack_kb(sub_meta, S),
        blkid=blk_np,
        pk=chunks_pk,
        po=chunks_po,
        val=chunks_val,
        got_static=jnp.asarray(got),
        eidx=chunks_idx,
        aux=aux, h_src=h_src)))


def _build_plan2u_native(lib, s, r, v, e, h, wr, nb, hub, windows,
                         cell_min, n_pad, n_send_pad, receivers0,
                         rows, rowmode_min, aux=None, h_src=None,
                         banded_cls=None):
    """C++/OpenMP v2u plan build (graphmat_tpu/native/planner.cpp)."""
    import ctypes

    S = max(rows // SUBR, 1)
    sa = np.ascontiguousarray(s, np.int32)
    ra = np.ascontiguousarray(r, np.int32)
    va = np.ascontiguousarray(v, np.float32)
    wins = np.ascontiguousarray(windows, np.int32)
    if np.isscalar(cell_min):
        cell_min = [cell_min] * len(wins)
    cms = np.ascontiguousarray(cell_min, np.int64)
    if banded_cls is None:
        banded_cls = [0] * len(wins)
    bnd = np.ascontiguousarray(banded_cls, np.int32)
    nc_out = ctypes.c_int64()
    handle = lib.gm_plan2u_create(sa, ra, va, e, h, wr, nb, hub, wins,
                                  len(wins), cms, bnd, rows, rowmode_min,
                                  ctypes.byref(nc_out))
    nc = int(nc_out.value)
    try:
        kb = np.empty(nc * S, np.int32)
        blkid = np.empty(nc, np.int32)
        pk = np.empty((nc, rows, LANE), np.int32)
        po = np.empty((nc, rows, LANE), np.int32)
        val = np.empty((nc, rows, LANE), np.float32)
        lib.gm_plan2u_fill(handle, kb, blkid, pk.reshape(-1),
                           po.reshape(-1), val.reshape(-1))
        eidx = np.empty((nc, rows, LANE), np.int32)
        lib.gm_plan2u_eidx(handle, eidx.reshape(-1))
        gmin_r = np.empty(nc * rows, np.int32)
        gmax_r = np.empty(nc * rows, np.int32)
        if hasattr(lib, "gm_plan2u_gspan"):
            lib.gm_plan2u_gspan(handle, gmin_r, gmax_r)
        else:
            gmin_r = None
    finally:
        lib.gm_plan2u_destroy(handle)

    got = np.zeros(n_pad, bool)
    got[np.unique(np.asarray(receivers0))] = True
    return _apply_splits(_maybe_validate_u(Spmv2uPlan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(int(w) for w in windows), rows=rows,
        splits=_compute_splits(blkid, nb),
        kb=kb, blkid=blkid, pk=pk, po=po, val=val,
        got_static=jnp.asarray(got), eidx=eidx,
        aux=aux, h_src=(h_src if h_src is not None else h)),
        gspan=(None if gmin_r is None else (gmin_r, gmax_r))))


def _maybe_validate_u(plan, gspan=None):
    if gspan is not None:
        plan._gspan = gspan
    from ..utils.debug import debug_enabled
    if debug_enabled():
        from ..utils.debug import validate_plan2u
        validate_plan2u(plan)
    return plan


# ------------------------------------------------------------------ kernel

def _make_kernel_u(reduce_kind: str, process: Callable, wr: int, h: int,
                   classes, debug=None, x2_hbm=False, rows=128,
                   sparse=False, use_val=True, want_got=False,
                   pipeline=False):
    G = wr // LANE
    wmax = max(classes)
    ntiles = rows // 8
    S = max(rows // SUBR, 1)
    stiles = ntiles // S          # tiles per sub-window
    moff = S * wmax if pipeline else wmax   # hub-mirror scratch offset
    is_sum = reduce_kind == "sum"
    ident = np.float32(0.0 if is_sum
                       else (np.inf if reduce_kind == "min" else -np.inf))
    comb = ((lambda a, b: a + b) if is_sum
            else (jnp.minimum if reduce_kind == "min" else jnp.maximum))

    def red0(m):       # reduce over rows -> [1, 128]
        if is_sum:
            return jnp.sum(m, axis=0, keepdims=True)
        return (jnp.min if reduce_kind == "min" else jnp.max)(
            m, axis=0, keepdims=True)

    def red1(m):       # reduce over lanes -> [8, 1]
        if is_sum:
            return jnp.sum(m, axis=1, keepdims=True)
        return (jnp.min if reduce_kind == "min" else jnp.max)(
            m, axis=1, keepdims=True)

    def kernel(kb_ref, blk_ref, *rest):
        if sparse:
            act_ref = rest[0]
            rest = rest[2:]   # rest[1] = eff_ref, used by index maps only
        if use_val:
            (pk_ref, po_ref, val_ref, x2_ref, y_ref,
             acc_ref, wscr_ref, *dma_sem) = rest
        else:
            (pk_ref, po_ref, x2_ref, y_ref,
             acc_ref, wscr_ref, *dma_sem) = rest
            val_ref = None
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])

        @pl.when(first)
        def _():
            if want_got:
                acc_ref[0:G, :] = jnp.full((G, LANE), ident, jnp.float32)
                acc_ref[G:2 * G, :] = jnp.zeros((G, LANE), jnp.float32)
            else:
                acc_ref[:] = jnp.full_like(acc_ref, ident)

        if x2_hbm:
            @pl.when(i == 0)
            def _():
                dma0 = pltpu.make_async_copy(
                    x2_ref.at[0:16, :], wscr_ref.at[moff:moff + 16, :],
                    dma_sem[0])
                dma0.start()
                dma0.wait()

        def compute():
            us = [jax.lax.bitcast_convert_type(
                      pk_ref[0, 8 * t: 8 * t + 8, :], jnp.uint32)
                  for t in range(ntiles)]
            hi2s = [(u >> 21).astype(jnp.int32) for u in us]
            slos = [((u >> RCF_BITS) & (LANE - 1)).astype(jnp.int32)
                    for u in us]
            rcfs = [(u & ((1 << RCF_BITS) - 1)).astype(jnp.int32)
                    for u in us]
            subs = [ix & 7 for ix in hi2s]
            gsels = [ix >> 3 for ix in hi2s]

            def gather_sub(tsel, kind_v, base_v, skip_load, boff=None):
                def gather_from(tbl_for_g, ngran):
                    xvs = [jnp.zeros((8, LANE), jnp.float32)
                           for _ in tsel]
                    for g in range(ngran):
                        tbl = tbl_for_g(g)
                        for k, t in enumerate(tsel):
                            got = jnp.take_along_axis(tbl, subs[t], axis=0)
                            xvs[k] = jnp.where(gsels[t] == g, got, xvs[k])
                    return tuple(xvs)

                def hub_branch():
                    def tbl(g):
                        if x2_hbm:
                            return wscr_ref[moff + 8 * g:
                                            moff + 8 * g + 8, :]
                        return x2_ref[8 * g: 8 * g + 8, :]
                    return gather_from(tbl, HUB_GRANULES2)

                def make_tbl(W):
                    """Granule table accessor.  HBM operand: DMA the
                    window into wscr (pipeline buffers when available).
                    VMEM-resident operand (h <= VMEM_X2_MAX_ROWS): read
                    x2 DIRECTLY at the dynamic window base — the wscr
                    staging copy moved nb * |x2| = 1 GB/iter of
                    VMEM-to-VMEM traffic on a 16M-edge uniform graph
                    (every receiver block re-reads the operand), and
                    was pure waste when x2 already sits in VMEM."""
                    if boff is not None:
                        return lambda g: wscr_ref[boff + 8 * g:
                                                  boff + 8 * g + 8, :]
                    base = pl.multiple_of(base_v, 8)
                    if not x2_hbm:
                        return lambda g: x2_ref[pl.ds(base + 8 * g, 8), :]
                    if debug != "nodma":   # ablation: walk w/o loads
                        @pl.when(jnp.logical_not(skip_load))
                        def _():
                            dma = pltpu.make_async_copy(
                                x2_ref.at[pl.ds(base, W), :],
                                wscr_ref.at[0:W, :], dma_sem[0])
                            dma.start()
                            dma.wait()
                    return lambda g: wscr_ref[8 * g: 8 * g + 8, :]

                def window_branch(W):
                    def inner():
                        return gather_from(make_tbl(W), W // 8)
                    return inner

                def banded_branch(W):
                    # flat cells pack tile k's slots inside a static
                    # granule band; the walk shrinks from W/8 granules
                    # per tile to the band width (planner guarantees
                    # the band covers every slot of that tile position)
                    def inner():
                        tbl_of = make_tbl(W)
                        ranges = _band_ranges(W)
                        xvs = []
                        for kk, t in enumerate(tsel):
                            s0, w = ranges[kk % len(ranges)]
                            q = jnp.zeros((8, LANE), jnp.float32)
                            for dg in range(w):
                                gg = s0 + dg
                                got = jnp.take_along_axis(
                                    tbl_of(gg), subs[t], axis=0)
                                q = jnp.where(gsels[t] == gg, got, q)
                            xvs.append(q)
                        return tuple(xvs)
                    return inner

                branches = ([hub_branch]
                            + [window_branch(W) for W in classes]
                            + [banded_branch(W) for W in classes])
                return list(jax.lax.switch(kind_v, branches))

            def win_dma_op(kind_t, base_t, boff_t, sem, pred, start):
                """Issue (or wait) the window DMA for a sub with traced
                class ``kind_t`` into the static-offset ping-pong
                buffer.  Issue and wait sites build identical copy
                descriptors against the same semaphore."""
                def noop():
                    pass

                def mk(W):
                    def go():
                        @pl.when(pred)
                        def _():
                            dma = pltpu.make_async_copy(
                                x2_ref.at[pl.ds(
                                    pl.multiple_of(base_t, 8), W), :],
                                wscr_ref.at[pl.ds(boff_t, W), :], sem)
                            if start:
                                dma.start()
                            else:
                                dma.wait()
                    return go
                jax.lax.switch(kind_t, [noop]
                               + [mk(W) for W in classes]
                               + [mk(W) for W in classes])

            if debug == "nogather":
                xvs = [jnp.full((8, LANE), 1.0, jnp.float32)
                       for _ in range(ntiles)]
            elif pipeline:
                # dense pipelined window loads: S wscr buffers, buffer =
                # sub position (static offset); each sub issues the DMA
                # for the sub S-1 ahead, keeping up to S-1 transfers in
                # flight so HBM bandwidth saturates under the granule
                # walk (PERF round 3: the synchronous DMA cost 21 of
                # 45.8 ms at RMAT-23; one-ahead recovered only ~3 ms —
                # per-sub walks are shorter than a 1 MB transfer)
                L = S - 1
                nsub_tot = pl.num_programs(0) * S
                xvs = []
                for sI in range(S):
                    j = i * S + sI
                    kbw = kb_ref[j]
                    kind_v = (kbw >> KB_KIND_SHIFT) & 15
                    base_v = (kbw & ((1 << 22) - 1)) << 3
                    fresh = (kbw & KB_PIPE) != 0
                    boff = sI * wmax
                    if sI < L:
                        # the grid's first L subs have no issuer
                        win_dma_op(kind_v, base_v, boff, dma_sem[sI],
                                   jnp.logical_and(fresh, i == 0),
                                   start=True)
                    # issue the sub L ahead (same chunk when sI == 0,
                    # else chunk i+1); its buffer's previous reader was
                    # sub j-1, already walked
                    sT = (sI + L) % S
                    if sI == 0 and L < S:
                        kbn = kb_ref[j + L]
                        predn = (kbn & KB_PIPE) != 0
                    else:
                        jn = jnp.minimum(j + L, nsub_tot - 1)
                        kbn = kb_ref[jn]
                        predn = jnp.logical_and(
                            (kbn & KB_PIPE) != 0,
                            i < pl.num_programs(0) - 1)
                    kindn = (kbn >> KB_KIND_SHIFT) & 15
                    basen = (kbn & ((1 << 22) - 1)) << 3
                    win_dma_op(kindn, basen, sT * wmax, dma_sem[sT],
                               predn, start=True)
                    win_dma_op(kind_v, base_v, boff, dma_sem[sI],
                               fresh, start=False)
                    xvs += gather_sub(
                        list(range(sI * stiles, (sI + 1) * stiles)),
                        kind_v, base_v, jnp.bool_(True), boff=boff)
                xvs = [jnp.take_along_axis(xvs[t], slos[t], axis=1)
                       for t in range(ntiles)]
            else:
                # per-sub window chain: the kb same/prev bits encode the
                # plan-time chain (hub subs transparent); the cross-chunk
                # case additionally requires the previous chunk to have
                # executed (sparse skip)
                prev = jnp.maximum(i - 1, 0)
                prev_ok = i > 0
                if sparse:
                    prev_ok = jnp.logical_and(prev_ok, act_ref[prev] != 0)
                xvs = []
                for sI in range(S):
                    kbw = kb_ref[i * S + sI]
                    kind_v = (kbw >> KB_KIND_SHIFT) & 15
                    base_v = (kbw & ((1 << 22) - 1)) << 3
                    same = (kbw & KB_SAME) != 0
                    from_prev = (kbw & KB_PREV) != 0
                    skip = jnp.logical_and(
                        same, jnp.logical_or(
                            jnp.logical_not(from_prev), prev_ok))
                    xvs += gather_sub(
                        list(range(sI * stiles, (sI + 1) * stiles)),
                        kind_v, base_v, skip)
                xvs = [jnp.take_along_axis(xvs[t], slos[t], axis=1)
                       for t in range(ntiles)]

            if want_got:
                xbs = [jax.lax.bitcast_convert_type(xv, jnp.int32)
                       for xv in xvs]
                afs = [(xb & 1).astype(jnp.float32) for xb in xbs]
                xvs = [jax.lax.bitcast_convert_type(
                           xb & np.int32(-2), jnp.float32)
                       for xb in xbs]

            ps = [process(xvs[t],
                          val_ref[0, 8 * t: 8 * t + 8, :] if use_val
                          else jnp.float32(0.0)).astype(jnp.float32)
                  for t in range(ntiles)]

            # ---- output-side routing: po decode + double-gather ----
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
            vts, cts, rgts = [], [], []
            for t in range(ntiles):
                ou = jax.lax.bitcast_convert_type(
                    po_ref[0, 8 * t: 8 * t + 8, :], jnp.uint32)
                rco = (ou & ((1 << RCF_BITS) - 1)).astype(jnp.int32)
                if debug == "noout":
                    vts.append(ps[t])
                    rgts.append(rcfs[t] >> 7)
                    if want_got:
                        cts.append(afs[t])
                    continue
                g1 = ((ou >> 21) & (LANE - 1)).astype(jnp.int32)
                g2 = ((ou >> RCF_BITS) & (LANE - 1)).astype(jnp.int32)
                has2 = ((ou >> 28) & 1).astype(jnp.int32)
                mode = ((ou >> 29) & 1).astype(jnp.int32)
                p = ps[t]
                v1 = jnp.take_along_axis(p, g1, axis=1)
                v2 = jnp.take_along_axis(p, g2, axis=1)
                if is_sum:
                    vcold = v1 + jnp.where(has2 == 1, v2, 0.0)
                else:
                    vcold = comb(v1, v2)
                # row-mode: whole-row reduce routed to the receiver lane
                padm = rcfs[t] == wr
                pm = jnp.where(padm, ident, p)
                rsum = red1(pm)                       # [8, 1]
                hit = lane_i == (rco & (LANE - 1))
                vrm = jnp.where(hit, jnp.broadcast_to(rsum, (8, LANE)),
                                ident)
                vts.append(jnp.where(mode == 1, vrm, vcold))
                rgts.append(rco >> 7)
                if want_got:
                    af = afs[t]
                    a1 = jnp.take_along_axis(af, g1, axis=1)
                    a2 = jnp.take_along_axis(af, g2, axis=1)
                    ccold = a1 + jnp.where(has2 == 1, a2, 0.0)
                    asum = jnp.sum(jnp.where(padm, 0.0, af), axis=1,
                                   keepdims=True)
                    crm = jnp.where(hit, jnp.broadcast_to(asum, (8, LANE)),
                                    0.0)
                    cts.append(jnp.where(mode == 1, crm, ccold))

            V = jnp.concatenate(vts, axis=0)          # [rows, 128]
            RG = jnp.concatenate(rgts, axis=0)
            if debug == "noscatter":
                acc_ref[0:1, :] = comb(acc_ref[0:1, :], red0(V))
                return
            if want_got:
                C = jnp.concatenate(cts, axis=0)
            for g in range(G):
                m = RG == g
                acc_ref[g:g + 1, :] = comb(
                    acc_ref[g:g + 1, :], red0(jnp.where(m, V, ident)))
                if want_got:
                    acc_ref[G + g:G + g + 1, :] = (
                        acc_ref[G + g:G + g + 1, :]
                        + jnp.sum(jnp.where(m, C, 0.0), axis=0,
                                  keepdims=True))

        if sparse:
            @pl.when(act_ref[i] != 0)
            def _():
                compute()
        else:
            compute()

        npr = pl.num_programs(0)
        nxt = jnp.minimum(i + 1, npr - 1)
        last = jnp.logical_or(i == npr - 1, blk_ref[nxt] != blk_ref[i])

        @pl.when(last)
        def _():
            y_ref[0] = acc_ref[:]

    return kernel


def _chunk_activity_u(pref, act_lo, act_hi, nc, S, alive=None):
    """Per-chunk frontier activity + effective-block routing: a chunk is
    active iff any x2 row in any of its subs' plan-precomputed gather
    ranges ``[act_lo, act_hi)`` is active.  ``pref`` is the inclusive
    row-activity prefix sum with a leading zero (int32[h+1], virtual
    compact rows included when the plan carries them).  Pad subs carry
    the empty range (plan build), so this is two takes + a compare —
    the kind/base decode that used to run here per iteration is folded
    to plan time (PERF round 4).  ``alive`` (optional bool[nc]) ANDs a
    receiver-side gate in before the effective-block routing (see
    ``recv_final`` in :func:`_spmv2u_call`)."""
    sub_act = (jnp.take(pref, act_hi) - jnp.take(pref, act_lo)) > 0
    cact = jnp.any(sub_act.reshape(nc, S), axis=1)
    if alive is not None:
        cact = cact & alive
    idxs = jnp.arange(nc, dtype=jnp.int32)
    eff = jax.lax.cummax(jnp.where(cact, idxs, -1))
    return cact.astype(jnp.int32), jnp.maximum(eff, 0)


@functools.partial(jax.jit, static_argnames=("plan_static", "reduce_kind",
                                              "process", "interpret",
                                              "debug", "x2_hbm",
                                              "want_got"))
def _spmv2u_call(plan_arrays, plan_static, x, reduce_kind, process,
                 interpret, debug=None, x2_hbm=None, sent=None,
                 want_got=False, recv_final=None):
    h, wr, nb, nc, n_pad, classes, rows = plan_static[:7]
    splits = plan_static[7] if len(plan_static) > 7 else ()
    h_src = plan_static[8] if len(plan_static) > 8 else h
    aux_static = plan_static[9] if len(plan_static) > 9 else None
    kb, blkid, pk, po, val = plan_arrays[:5]
    use_val = val is not None

    def _arr(i):
        return plan_arrays[i] if len(plan_arrays) > i else None
    # compact layout (trailing slots absent rather than None — shard_map
    # specs cannot carry Nones): with aux, 5-6 aux kb/pk, 7-8 vlo/vhi,
    # then act_lo/act_hi [+ act_gm, act_vm]; without aux the act slots
    # start at 5.  Callers passing only the first 5 (legacy dist tile
    # stacks) get the in-trace decode fallbacks.
    has_aux = len(plan_static) > 9 and plan_static[9] is not None
    if has_aux:
        aux_arrs = (plan_arrays[5], plan_arrays[6])
        vlo_a, vhi_a = _arr(7), _arr(8)
        ab = 9
    else:
        aux_arrs = None
        vlo_a = vhi_a = None
        ab = 5
    act_pair = ((_arr(ab), _arr(ab + 1))
                if _arr(ab) is not None else None)
    act_gm_a, act_vm_a = _arr(ab + 2), _arr(ab + 3)
    G = wr // LANE
    GA = 2 * G if want_got else G
    S = max(rows // SUBR, 1)
    x2 = x.reshape(h_src, LANE)
    sparse = sent is not None
    pref = None
    vact = None
    gact_f = None
    if sparse:
        if sent.shape[0] < h_src * LANE:
            sent = jnp.pad(sent, (0, h_src * LANE - sent.shape[0]))
        sentm = sent[: h_src * LANE].reshape(h_src, LANE)
        use_gm = (act_gm_a is not None
                  and (h == h_src or act_vm_a is not None))
        if use_gm:
            # matmul activity (the fast path): granule activity vector
            # ⊗ plan-static overlap matrix.  A TPU 1D gather costs
            # ~26 ns/index, so the take-based range test below cost
            # ~0.27 ms/level at RMAT-20 — the single largest BFS
            # per-level fixed cost (PERF round 4 microbench).
            ngran_src = h_src // ACT_GRAN
            gact = jnp.any(sentm.reshape(ngran_src, ACT_GRAN * LANE),
                           axis=1)
            if h > h_src:
                gsrc_f = gact.astype(jnp.bfloat16)
                vact = jnp.matmul(
                    act_vm_a, gsrc_f,
                    preferred_element_type=jnp.float32) > 0
                hcg = (h - h_src) // ACT_GRAN
                gact = jnp.concatenate(
                    [gact, jnp.any(vact.reshape(hcg, ACT_GRAN),
                                   axis=1)])
            gact_f = gact.astype(jnp.bfloat16)
        else:
            rowact = jnp.any(sentm, axis=1).astype(jnp.int32)
            pref = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(rowact)])
            if h > h_src:
                # virtual-row activity: each compact row carries its
                # real entries' source-row range [vlo, vhi), so
                # activity is one prefix-range test over the source
                # row-activity — a tight superset of the exact
                # per-lane mask (supersets are CORRECT: inactive
                # senders' values are identity-filled upstream)
                vact = (jnp.take(pref, vhi_a)
                        - jnp.take(pref, vlo_a)) > 0
                # extend the prefix over the virtual rows
                pref = jnp.concatenate(
                    [pref,
                     pref[-1] + jnp.cumsum(vact.astype(jnp.int32))])
    if aux_static is not None:
        # hypersparse compaction: materialize the virtual compact rows
        # (one cheap gather pass per super-block) and extend the operand
        from .pallas_compact import _aux_call
        hc = aux_static[1]
        if vact is not None:
            # sparse levels where NO diverted sender is active (BFS
            # whisker tails) skip the aux pass entirely: inactive
            # compact rows are never gathered by an ACTIVE chunk, but
            # an active chunk's other subs do walk them — so the
            # skipped branch must fill the region with the ⊕-identity,
            # not leave garbage
            ident = {"sum": 0.0, "min": 1e30, "max": -1e30}[reduce_kind]
            xc = jax.lax.cond(
                jnp.any(vact),
                lambda: _aux_call(aux_arrs, aux_static, x2, interpret),
                lambda: jnp.full((hc, LANE), ident, jnp.float32))
        else:
            xc = _aux_call(aux_arrs, aux_static, x2, interpret)
        x2 = jnp.concatenate([x2, xc], axis=0)

    blk_final = None
    if sparse and recv_final is not None:
        # receiver-side chunk gate: a block whose receivers are ALL
        # final (program-exact no-op guarantee, GraphProgram.
        # receiver_final) deactivates every chunk targeting it.  Output
        # rows beyond n_pad are plan padding — count them final.
        rf = recv_final
        if rf.shape[0] < nb * wr:
            rf = jnp.pad(rf, (0, nb * wr - rf.shape[0]),
                         constant_values=True)
        blk_final = jnp.all(rf[: nb * wr].reshape(nb, wr), axis=1)

    if x2_hbm is None:
        x2_hbm = h > VMEM_X2_MAX_ROWS and not interpret
    # dense double-buffered window pipeline: needs the HBM operand path,
    # an even sub count (static ping-pong parity), and no sparse chunk
    # skip (skipped chunks would break the one-ahead issue invariant)
    pipeline = bool(x2_hbm and not sparse and rows // SUBR >= 2
                    and (rows // SUBR) % 2 == 0 and debug is None)
    kernel = _make_kernel_u(reduce_kind, process, wr, h, classes, debug,
                            x2_hbm, rows, sparse, use_val, want_got,
                            pipeline=pipeline)
    wmax = max(classes) if classes else 8
    if sparse:
        nmap = lambda i, *pf: (pf[3][i], 0, 0)      # eff
        omap = lambda i, *pf: (pf[1][i], 0, 0)      # blkid
    else:
        nmap = lambda i, *_: (i, 0, 0)
        omap = lambda i, *pf: (pf[1][i], 0, 0)      # blkid
    chunk_spec = pl.BlockSpec((1, rows, LANE), nmap,
                              memory_space=pltpu.VMEM)
    x2_spec = pl.BlockSpec(memory_space=(pltpu.ANY if x2_hbm
                                         else pltpu.VMEM))
    nbuf = S if pipeline else 0
    wscr_rows = ((nbuf * wmax + 16) if pipeline
                 else wmax + (16 if x2_hbm else 0))
    scratch = [pltpu.VMEM((GA, LANE), jnp.float32),
               pltpu.VMEM((wscr_rows, LANE), jnp.float32)]
    if x2_hbm:
        scratch.append(pltpu.SemaphoreType.DMA(()))
        for _ in range(max(nbuf - 1, 0)):
            scratch.append(pltpu.SemaphoreType.DMA(()))

    segs = splits if len(splits) > 1 else ((0, 0),)
    bounds = [(segs[k][0], segs[k][1],
               segs[k + 1][0] if k + 1 < len(segs) else nc,
               segs[k + 1][1] if k + 1 < len(segs) else nb)
              for k in range(len(segs))]
    multi = isinstance(pk, (tuple, list))
    assert multi == (len(bounds) > 1), \
        "segmented plans must store per-segment arrays (_apply_splits)"
    outs = []
    for k, (c0, b0, c1, b1) in enumerate(bounds):
        nc_s, nb_s = c1 - c0, b1 - b0
        if multi:   # host-side pre-split (blkid already rebased)
            kb_s, blk_s = kb[k], blkid[k]
            pk_s, po_s = pk[k], po[k]
            val_s = val[k] if use_val else None
        else:
            kb_s, blk_s, pk_s, po_s = kb, blkid, pk, po
            val_s = val
        if sparse:
            alive = (None if blk_final is None
                     else ~jnp.take(blk_final, b0 + blk_s))
            if gact_f is not None:
                gm_s = act_gm_a[k] if multi else act_gm_a
                sub_act = jnp.matmul(
                    gm_s, gact_f,
                    preferred_element_type=jnp.float32) > 0
                cact = jnp.any(sub_act.reshape(nc_s, S), axis=1)
                if alive is not None:
                    cact = cact & alive
                idxs = jnp.arange(nc_s, dtype=jnp.int32)
                eff = jnp.maximum(
                    jax.lax.cummax(jnp.where(cact, idxs, -1)), 0)
                act = cact.astype(jnp.int32)
            else:
                if act_pair is not None:
                    alo, ahi = act_pair
                    if multi:
                        alo, ahi = alo[k], ahi[k]
                else:
                    # caller without plan-precomputed ranges (stacked
                    # dist tile plans): decode kind/base in-trace
                    # (banded kinds K+1..2K share their class's window)
                    wlen = jnp.asarray(np.array([16] + list(classes)
                                                + list(classes)),
                                       jnp.int32)
                    kd = (kb_s >> KB_KIND_SHIFT) & 15
                    bs = (kb_s & ((1 << 22) - 1)) << 3
                    alo = jnp.where(kd == 0, 0, bs)
                    ahi = jnp.minimum(alo + jnp.take(wlen, kd), h)
                    padm = (kb_s & KB_PAD) != 0
                    alo = jnp.where(padm, 0, alo)
                    ahi = jnp.where(padm, 0, ahi)
                act, eff = _chunk_activity_u(pref, alo, ahi, nc_s, S,
                                             alive=alive)
            operands = (kb_s, blk_s, act, eff)
        else:
            operands = (kb_s, blk_s)
        planes = ((pk_s, po_s, val_s, x2) if use_val
                  else (pk_s, po_s, x2))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4 if sparse else 2,
            grid=(nc_s,),
            in_specs=([chunk_spec, chunk_spec, chunk_spec, x2_spec]
                      if use_val
                      else [chunk_spec, chunk_spec, x2_spec]),
            out_specs=pl.BlockSpec((1, GA, LANE), omap,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        outs.append(pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb_s, GA, LANE), jnp.float32),
            interpret=interpret,
        )(*operands, *planes))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if want_got:
        return (out[:, :G].reshape(nb * wr)[:n_pad],
                out[:, G:].reshape(nb * wr)[:n_pad])
    return out.reshape(nb * wr)[:n_pad]


def refresh_plan2u_vals(plan, new_vals) -> bool:
    """applyToAllEdges fast path: patch the val plane in place via the
    host eidx map (original edge order), no replan — the reference
    mutates tile vals in place (``singlenode/applyedges.h:38-95``)."""
    if getattr(plan, "eidx", None) is None:
        return False
    nv = np.asarray(new_vals, np.float32)
    ei = plan.eidx
    val = np.where(ei >= 0, nv[np.maximum(ei, 0)], np.float32(0.0))
    val = val.astype(np.float32)
    if isinstance(plan.pk, tuple):       # segmented storage
        segs = plan.splits
        bounds = [(segs[k][0],
                   segs[k + 1][0] if k + 1 < len(segs) else plan.nc)
                  for k in range(len(segs))]
        plan.val = tuple(jnp.asarray(val[c0:c1]) for (c0, c1) in bounds)
    else:
        plan.val = jnp.asarray(val)
    return True


def plan_call_args(plan: Spmv2uPlan, use_val: bool = True):
    """(plan_arrays, plan_static) for :func:`_spmv2u_call`, including the
    compaction aux arrays when the plan carries them."""
    aux = plan.aux
    h_src = plan.h_src or plan.h
    if aux is not None:
        if not isinstance(aux.kb, jnp.ndarray):   # one-time device upload
            aux.kb = jnp.asarray(aux.kb)
            aux.pk = jnp.asarray(aux.pk)
            aux.vlo = jnp.asarray(aux.vlo)
            aux.vhi = jnp.asarray(aux.vhi)
            if aux.act_vm is not None:
                aux.act_vm = jnp.asarray(aux.act_vm, jnp.bfloat16)
        arrays = (plan.kb, plan.blkid, plan.pk, plan.po,
                  plan.val if use_val else None, aux.kb, aux.pk,
                  aux.vlo, aux.vhi, plan.act_lo, plan.act_hi)
        if plan.act_gm is not None and aux.act_vm is not None:
            arrays = arrays + (plan.act_gm, aux.act_vm)
        aux_static = (aux.h, aux.hc, aux.W, aux.naux, aux.rows)
    else:
        arrays = (plan.kb, plan.blkid, plan.pk, plan.po,
                  plan.val if use_val else None, plan.act_lo,
                  plan.act_hi)
        if plan.act_gm is not None:
            arrays = arrays + (plan.act_gm,)
        aux_static = None
    static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
              plan.classes, plan.rows, plan.splits, h_src, aux_static)
    return arrays, static


def spmv2u(plan: Spmv2uPlan, x, reduce_kind: str = "sum",
           process: Optional[Callable] = None, interpret: bool = False,
           sent=None, with_got: bool = False):
    """Generalized SpMV on the unified layout:
    ``y[r] = ⊕_{(s->r)} process(x[s], val)`` with ⊕ in {sum, min, max}.

    ``sent``/``with_got`` as in :func:`spmv2`/``spmv2m`` — the sparse
    frontier chunk skip and the fused y-bitvector (sum only; min/max
    programs detect receipt via the ±sentinel instead).
    """
    assert reduce_kind in ("sum", "min", "max")
    if process is None:
        process = _identity_process
    if x.shape[0] < plan.n_send_pad:
        x = jnp.pad(x, (0, plan.n_send_pad - x.shape[0]))
    x = x[: plan.n_send_pad].astype(jnp.float32)
    plan_arrays, plan_static = plan_call_args(plan)
    if with_got:
        assert reduce_kind == "sum", "with_got rides the sum layout"
        assert sent is not None, "with_got requires the sent mask"
        sent_p = sent
        if sent_p.shape[0] < plan.n_send_pad:
            sent_p = jnp.pad(sent_p,
                             (0, plan.n_send_pad - sent_p.shape[0]))
        x = jnp.where(sent_p[: plan.n_send_pad], x, 0.0)
        x = encode_sent_bit(x, sent_p[: plan.n_send_pad])
        y, cnt = _spmv2u_call(plan_arrays, plan_static, x, reduce_kind,
                              process, interpret, sent=sent,
                              want_got=True)
        return y, cnt > 0
    return _spmv2u_call(plan_arrays, plan_static, x, reduce_kind, process,
                        interpret, sent=sent)
