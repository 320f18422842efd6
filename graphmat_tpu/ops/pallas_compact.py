"""Hypersparse operand compaction — the DCSC doubly-compressed analog.

The reference's default tile format stores only NON-EMPTY columns
precisely because 2D tiling makes tiles hypersparse
(``/root/reference/include/GMDP/matrices/DCSCTile.h:70-76``).  The v2u
layout's analogous wall (measured, PERF.md round 3): at RMAT-23 the
gather phase costs 30.2 of 41.5 ms/iter because every (receiver-block,
sender-window) cell re-walks and re-DMAs its W-row window of the
operand — ~nb full passes over x2 per iteration — while the cells
themselves average ~2000 edges (fill 0.458).

Fix, in three parts:

* **Divert** edges in sparse cells (below ``divert_min`` edges per
  coarse window) out of the direct window path.  Receiver blocks are
  grouped into SUPER-BLOCKS of ``bpsb`` blocks; each super-block gets a
  COMPACTED operand region holding the x values of the distinct senders
  its diverted edges touch, sorted by sender id.

* **Auxiliary gather kernel** (this module): each iteration, one cheap
  Pallas pass walks x2 windows ONCE PER SUPER-BLOCK (not once per
  block) and writes the compact regions — a pure routed gather, no
  accumulator, no out-routing.  Total operand traffic drops from
  ``nb x |x2|`` to ``nsb x |x2| + O(E_diverted)``.

* **Virtual senders**: a diverted edge's sender id is rewritten to
  ``h*128 + compact_position`` and the main v2u plan is built over the
  EXTENDED operand ``concat(x2, aux(x2))`` — the main kernel needs no
  changes; its window classes now see DENSE cells (a block's diverted
  senders occupy 1/bpsb of its super-block's compact region instead of
  1/nb of all of x2), recovering fill and killing the re-read.

Pad entries (group alignment) gather row 0 — their values are garbage
but no main-plan slot ever references a pad position.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv2 import LANE, VMEM_X2_MAX_ROWS

__all__ = ["CompactAux", "divert_stragglers", "divert_stragglers_vec2",
           "aux_gather"]

SUBR = 32              # rows per sub-window (matches the v2u granularity)
KB_SAME = 1 << 22      # sub reuses the previous sub's window (skip DMA)
# defaults (see divert_stragglers docstring for the cost model)
DIVERT_MIN = 6000
BPSB = 32
W_DIV = 2048
W_AUX = 1024
# x2 rows below which compaction is off by default: same-session A/B
# showed a win already at RMAT-20 (8192 rows, VMEM operand): 2.54 ->
# 2.44 ms/iter via slot fill 0.658 -> 0.680 (PERF round 3)
H_COMPACT_MIN = 8192

# vec2 (K-wide) compaction defaults.  A vec2 operand row holds FOUR
# vertices (vs 128 in the scalar layout), so windows cover 32x fewer
# senders per row and hypersparsity bites at ~1/32 the scale; a chunk's
# capacity is 128 slots fed from a 32-row receiver span, so a cell only
# saturates fill near ~4096 edges (vs cell_min 512): both thresholds
# are therefore much higher than the scalar ones.  bpsb is 1 — the
# ratings-graph regime barely dedups across blocks (measured ~1.2
# edges/distinct (block, sender) pair at the 10M SGD protocol), and the
# aux read chain only loads the windows a block's senders touch.
VEC_DIVERT_MIN = 3072
VEC_CELL_MIN = 3072
VEC_H_COMPACT_MIN = 32768     # V4 rows (= 128K vertices)
KBLK = 32                     # lanes per vec2 vertex entry


def _argsort(k: np.ndarray) -> np.ndarray:
    """Native parallel argsort when available (planner.cpp
    gm_argsort_i64 — the DCSCTile.h:252 parallel-sort analog);
    np.argsort dominated graph build at RMAT-23/24 otherwise."""
    from ..native import load_planner
    lib = load_planner()
    if lib is not None and hasattr(lib, "gm_argsort_i64"):
        out = np.empty(len(k), np.int64)
        lib.gm_argsort_i64(np.ascontiguousarray(k, np.int64), len(k), out)
        return out
    return np.argsort(k, kind="stable")


@dataclass
class CompactAux:
    """Aux gather plan: ``out[pos] = x2[src_row(pos), src_lane(pos)]``."""
    h: int                # SOURCE x2 rows (original operand)
    hc: int               # compact rows produced (multiple of rows)
    W: int                # aux window rows (aligned)
    naux: int             # grid chunks
    rows: int             # rows per chunk (128)
    n_entries: int        # real (non-pad) compact entries
    kb: Any               # i32[naux * S]: base>>3 | KB_SAME
    pk: Any               # i32[naux, rows, 128]: rel_row<<7 | lane
    # per-COMPACT-ROW real-entry source-row range [vlo, vhi): the sparse
    # path derives virtual-row activity as a prefix-sum range test over
    # the source row-activity — a tight superset of the exact per-lane
    # activity that replaces a whole aux Pallas pass per direction per
    # iteration (~0.4 ms/BFS-level measured, PERF round 4).  All-pad
    # rows carry vlo == vhi == 0 (never active).
    vlo: Any = None       # i32[hc]
    vhi: Any = None       # i32[hc]
    # granule-overlap matrix over SOURCE granules (bf16 on device):
    # vact = (act_vm @ gact_src) > 0 — the matmul form of the [vlo,vhi)
    # range test (TPU 1D gathers cost ~26 ns/index; see pallas_spmv2u
    # ACT_GRAN).  None above the size cap.
    act_vm: Any = None    # bool/bf16 [hc, ceil(h/ACT_GRAN)]


def _build_aux(src_of_pos: np.ndarray, h: int, W: int,
               rows: int, n_entries: int) -> CompactAux:
    """Pack the position->source map into aux chunks.  ``src_of_pos``
    must be grouped so every SUBR-row run lies in one aligned W-row
    source window (the caller pads groups to SUBR*LANE entries)."""
    total = len(src_of_pos)
    assert total % (rows * LANE) == 0
    hc = total // LANE
    naux = hc // rows
    S = rows // SUBR
    srow = (src_of_pos >> 7).astype(np.int64)
    slane = (src_of_pos & (LANE - 1)).astype(np.int32)

    sub_first = srow[:: SUBR * LANE]                  # [naux * S]
    base = (sub_first // W) * W
    base = np.minimum(base, max(h - W, 0))
    # window-purity check (cheap, catches layout bugs loudly)
    sub_max = srow.reshape(-1, SUBR * LANE).max(axis=1)
    assert (sub_max < base + W).all(), "aux sub spans two source windows"
    kb = (base >> 3).astype(np.uint32)
    same = np.zeros(len(kb), bool)
    same[1:] = base[1:] == base[:-1]
    kb = (kb | np.where(same, np.uint32(KB_SAME), 0)).view(np.int32)

    rel = srow - np.repeat(base, SUBR * LANE)
    pk = ((rel.astype(np.int32) << 7) | slane).reshape(naux, rows, LANE)
    return CompactAux(h=h, hc=hc, W=W, naux=naux, rows=rows,
                      n_entries=n_entries, kb=np.ascontiguousarray(kb),
                      pk=np.ascontiguousarray(pk))


def divert_stragglers(s: np.ndarray, r: np.ndarray, n_recv_pad: int,
                      wr: int, h: int, hub: int,
                      divert_min: int = DIVERT_MIN, bpsb: int = BPSB,
                      w_div: int = W_DIV, w_aux: int = W_AUX,
                      rows: int = 128):
    """Rewrite straggler senders to virtual compact positions.

    Returns ``(s_new, aux, h_ext)``; ``aux is None`` when nothing
    diverts.  Cost model for ``divert_min``: a (block, w_div-window)
    cell on the direct path costs one ``w_div x 512 B`` window DMA per
    iteration; a diverted edge costs ~4 B in the aux write + ~4 B read
    per block of its super-block (bpsb) — break-even near
    ``w_div*512 / (4*(bpsb+3)) ~ 7500`` edges/cell; below that the
    compact path wins.  Hub senders (id < hub) never divert (their
    gather reads the VMEM head mirror, no DMA).
    """
    e = len(s)
    if e == 0:
        return s, None, h
    # int32 working set: the whole-edge-list passes below are numpy
    # memory-bandwidth bound (~20 sweeps over e elements) — halving the
    # element width matters more than any of the compute
    s = np.asarray(s, np.int64)
    s32 = np.asarray(s, np.int32)
    blk32 = (np.asarray(r, np.int32) // np.int32(wr))
    nb = max(n_recv_pad // wr, 1)
    nwin = -(-h // w_div)
    cell = blk32 * np.int32(nwin) + (s32 >> 7) // np.int32(w_div)
    cnt = np.bincount(cell, minlength=nb * nwin)
    div = (s32 >= hub) & (cnt[cell] < divert_min)
    ndiv = int(div.sum())
    if ndiv == 0:
        return s, None, h
    blk = blk32[div].astype(np.int64)

    # unique (super-block, sender) pairs, sorted sb-major / sender-asc
    # (native parallel argsort; unique/inverse from sorted run bounds)
    sb = blk // bpsb                        # blk is already div-selected
    key = (sb << 34) | s[div]
    order0 = _argsort(key)
    ks = key[order0]
    newu = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else \
        np.zeros(0, bool)
    uk = ks[newu]
    inv = np.empty(len(key), np.int64)
    inv[order0] = np.cumsum(newu) - 1
    usb = uk >> 34
    usrc = uk & ((1 << 34) - 1)
    # group = (sb, aligned w_aux source window).  The layout is
    # LANE-PURE: an entry sits at the LANE OF ITS SOURCE (src & 127), so
    # the aux gather is a per-lane granule take with NO lane routing —
    # a routed layout would need v2u-style registration discipline
    # (one gather row per (row, lane)); without it, position p silently
    # reads the row registered by whichever entry owns p's source lane
    # (the round-3 corruption bug: lane-identity test layouts masked it).
    # Per (group, lane) entries stack vertically; groups pad to SUBR-row
    # multiples, so every sub is window-pure.
    gkey = (usb << 20) | (usrc >> 7) // w_aux
    gb = np.r_[0, np.flatnonzero(gkey[1:] != gkey[:-1]) + 1, len(uk)]
    gsize = np.diff(gb)
    grp_of_u = np.repeat(np.arange(len(gsize)), gsize)
    lane_u = (usrc & (LANE - 1)).astype(np.int64)
    # rank within (group, lane): entries are (grp, src)-sorted, so sort
    # by (grp, lane) stably (native parallel argsort) and count runs
    order2 = _argsort(grp_of_u * LANE + lane_u)
    gl = grp_of_u[order2] * LANE + lane_u[order2]
    runb = np.r_[0, np.flatnonzero(gl[1:] != gl[:-1]) + 1, len(uk)]
    rank_sorted = np.arange(len(uk)) - np.repeat(runb[:-1],
                                                 np.diff(runb))
    rank = np.empty(len(uk), np.int64)
    rank[order2] = rank_sorted
    # group rows = max lane occupancy, padded to a SUBR multiple
    gl_cnt = np.bincount(grp_of_u * LANE + lane_u,
                         minlength=len(gsize) * LANE)
    grows = -(-gl_cnt.reshape(-1, LANE).max(axis=1) // SUBR) * SUBR
    grows = np.maximum(grows, SUBR)
    goff = np.r_[0, np.cumsum(grows * LANE)]
    total = int(goff[-1])
    chunk_unit = rows * LANE
    total_pad = -(-total // chunk_unit) * chunk_unit

    pos_of_u = goff[grp_of_u] + rank * LANE + lane_u

    src_of_pos = np.zeros(total_pad, np.int64)
    src_of_pos[pos_of_u] = usrc
    # pad entries must stay within their group's window AND keep the
    # lane-pure invariant: point them at (group base row, own lane)
    pad_mask = np.ones(total_pad, bool)
    pad_mask[pos_of_u] = False
    gfirst_row = ((usrc[gb[:-1]] >> 7) // w_aux) * w_aux
    base_of_pos = np.repeat(gfirst_row, grows * LANE)
    if total_pad > total:
        base_of_pos = np.r_[base_of_pos,
                            np.zeros(total_pad - total, np.int64)]
    lane_of_pos = np.arange(total_pad, dtype=np.int64) & (LANE - 1)
    src_of_pos[pad_mask] = (base_of_pos[pad_mask] * LANE
                            + lane_of_pos[pad_mask])

    aux = _build_aux(src_of_pos, h, w_aux, rows, len(uk))
    # lane-purity invariant: every position's source lane is its own
    assert (src_of_pos & (LANE - 1) == lane_of_pos).all(), \
        "compact layout lost lane purity"
    # per-compact-row [vlo, vhi) real-entry source-row ranges (pads
    # excluded so all-pad rows are never active)
    srow_mat = (src_of_pos >> 7).reshape(-1, LANE)
    real_mat = (~pad_mask).reshape(-1, LANE)
    vlo = np.where(real_mat, srow_mat, h).min(axis=1)
    vhi = np.where(real_mat, srow_mat, -1).max(axis=1) + 1
    empty = vhi <= vlo
    vlo[empty] = 0
    vhi[empty] = 0
    aux.vlo = vlo.astype(np.int32)
    aux.vhi = vhi.astype(np.int32)
    from .pallas_spmv2u import ACT_GRAN, ACT_GM_MAX_ENTRIES
    ngran = -(-h // ACT_GRAN)
    if aux.hc * ngran <= ACT_GM_MAX_ENTRIES:
        glo = aux.vlo // ACT_GRAN
        ghi = np.maximum(-(-aux.vhi // ACT_GRAN), glo)
        mm = np.zeros((aux.hc, ngran + 1), np.int8)
        rowsq = np.arange(aux.hc)
        np.add.at(mm, (rowsq, glo), 1)
        np.add.at(mm, (rowsq, ghi), -1)
        mm[np.asarray(empty)] = 0
        aux.act_vm = np.ascontiguousarray(
            np.cumsum(mm[:, :-1], axis=1) > 0)
    s_new = s.copy()
    s_new[div] = h * LANE + pos_of_u[inv]
    h_ext = h + aux.hc
    return s_new, aux, h_ext


def divert_stragglers_vec2(s: np.ndarray, r: np.ndarray, hs: int,
                           wr: int, wy: int, windows, cell_min: int,
                           divert_min: int = VEC_DIVERT_MIN,
                           w_aux: int = W_AUX, rows: int = 128):
    """Hypersparse compaction for the vec2 (K-wide) operand layout.

    The vec2 analog of :func:`divert_stragglers` — the reference keeps
    any-K ``LatentVector<Size>`` payloads cache-resident per thread
    partition (``multinode/spmspv3.h:41-267``); on TPU the equivalent
    is keeping the sender *windows* dense.  A vec2 operand row V4 holds
    four vertices' 32-wide vectors (vertex ``v`` -> row ``v//4``,
    lane-block ``v%4``), so an edge's pseudo-flat position is
    ``(v//4)*128 + (v%4)*32`` and the compact layout is built at
    VERTEX granularity: one entry = one 32-lane block, 4 entries per
    row, lane-block purity (``cpos % 4 == v % 4``) so the aux gather
    stays a per-lane granule take with no lane routing.

    Divert rule mirrors the plan classifier (same greedy small-window
    acceptance at ``cell_min``): edges left to the LAST window class
    whose last-class cell holds under ``divert_min`` edges divert.
    Regions are per RECEIVER BLOCK (bpsb = 1; see VEC_DIVERT_MIN note),
    grouped by aligned ``w_aux`` source window so the aux chain loads
    each touched window once per block.

    Returns ``(s_new, aux, hs_ext)``; ``aux is None`` if nothing
    diverts.  Virtual ids: ``4*(hs + pos_row) + lane_block``.
    """
    e = len(s)
    if e == 0:
        return np.asarray(s, np.int64), None, hs
    w_aux = min(w_aux, hs)         # aux window cannot exceed the operand
    s = np.asarray(s, np.int64)
    r = np.asarray(r, np.int64)
    srow = s >> 2
    rwin = (r >> 2) // wy
    nrw = int(rwin.max()) + 1
    windows = sorted({int(min(w, hs)) for w in windows})
    remaining = np.ones(e, bool)
    for W in windows[:-1]:
        if not remaining.any():
            break
        nsw = -(-hs // W)
        cell = rwin * nsw + srow // W
        cnt = np.bincount(cell[remaining], minlength=nrw * nsw)
        remaining &= ~(cnt[cell] >= cell_min)
    Wl = windows[-1]
    nswl = -(-hs // Wl)
    cll = rwin * nswl + srow // Wl
    cntl = np.bincount(cll[remaining], minlength=nrw * nswl) \
        if remaining.any() else np.zeros(nrw * nswl, np.int64)
    div = remaining & (cntl[cll] < divert_min)
    ndiv = int(div.sum())
    if ndiv == 0:
        return s, None, hs

    blk = (r[div] // wr).astype(np.int64)        # bpsb = 1
    f = (srow[div] << 7) | ((s[div] & 3) << 5)   # pseudo-flat position
    assert f.max() < (1 << 34)
    key = (blk << 34) | f
    order0 = _argsort(key)
    ks = key[order0]
    newu = np.r_[True, ks[1:] != ks[:-1]]
    uk = ks[newu]
    inv = np.empty(ndiv, np.int64)
    inv[order0] = np.cumsum(newu) - 1
    usrc = uk & ((1 << 34) - 1)
    usb = uk >> 34
    # group = (block, aligned w_aux source window); entries stack per
    # (group, lane-block) in sender order
    gwin = (usrc >> 7) // w_aux
    assert gwin.max(initial=0) < (1 << 20)
    gkey = (usb << 20) | gwin
    gb = np.r_[0, np.flatnonzero(gkey[1:] != gkey[:-1]) + 1, len(uk)]
    gsize = np.diff(gb)
    grp_of_u = np.repeat(np.arange(len(gsize)), gsize)
    lane_u = (usrc & (LANE - 1)).astype(np.int64)   # in {0, 32, 64, 96}
    order2 = _argsort(grp_of_u * LANE + lane_u)
    gl = grp_of_u[order2] * LANE + lane_u[order2]
    runb = np.r_[0, np.flatnonzero(gl[1:] != gl[:-1]) + 1, len(uk)]
    rank_sorted = np.arange(len(uk)) - np.repeat(runb[:-1],
                                                 np.diff(runb))
    rank = np.empty(len(uk), np.int64)
    rank[order2] = rank_sorted
    gl_cnt = np.bincount(grp_of_u * LANE + lane_u,
                         minlength=len(gsize) * LANE)
    grows = -(-gl_cnt.reshape(-1, LANE).max(axis=1) // SUBR) * SUBR
    grows = np.maximum(grows, SUBR)
    goff = np.r_[0, np.cumsum(grows * LANE)]
    total = int(goff[-1])
    chunk_unit = rows * LANE
    total_pad = -(-total // chunk_unit) * chunk_unit
    pos_of_u = goff[grp_of_u] + rank * LANE + lane_u

    src_of_pos = np.zeros(total_pad, np.int64)
    src_of_pos[pos_of_u] = usrc
    pad_mask = np.ones(total_pad, bool)
    pad_mask[pos_of_u] = False
    gfirst_row = ((usrc[gb[:-1]] >> 7) // w_aux) * w_aux
    base_of_pos = np.repeat(gfirst_row, grows * LANE)
    if total_pad > total:
        base_of_pos = np.r_[base_of_pos,
                            np.zeros(total_pad - total, np.int64)]
    lane_of_pos = np.arange(total_pad, dtype=np.int64) & (LANE - 1)
    src_of_pos[pad_mask] = (base_of_pos[pad_mask] * LANE
                            + lane_of_pos[pad_mask])
    # broadcast each entry's source row across its 32-lane block: an
    # entry occupies lane b*32 only (lane_u multiples of KBLK); lanes
    # b*32+1..b*32+31 must fetch the SAME vertex's remaining 31
    # components — same row, own lane (lane purity preserved; block
    # pads keep the group-base row on every lane)
    rowm = (src_of_pos >> 7).reshape(-1, LANE)
    row_b = np.repeat(rowm[:, ::KBLK], KBLK, axis=1)
    src_of_pos = (row_b.astype(np.int64) << 7
                  | lane_of_pos.reshape(-1, LANE)).reshape(-1)

    aux = _build_aux(src_of_pos, hs, w_aux, rows, len(uk))
    assert (src_of_pos & (LANE - 1) == lane_of_pos).all(), \
        "vec2 compact layout lost lane purity"
    pos = pos_of_u[inv]
    s_new = s.copy()
    s_new[div] = 4 * (hs + (pos >> 7)) + ((pos & (LANE - 1)) >> 5)
    return s_new, aux, hs + aux.hc


# ------------------------------------------------------------------ kernel

def _make_aux_kernel(W: int, x2_hbm: bool, rows: int):
    ntiles = rows // 8
    S = rows // SUBR
    stiles = ntiles // S

    def kernel(kb_ref, pk_ref, x2_ref, out_ref, wscr_ref, *dma_sem):
        i = pl.program_id(0)
        for sI in range(S):
            kbw = kb_ref[i * S + sI]
            base = pl.multiple_of((kbw & ((1 << 22) - 1)) << 3, 8)
            same = (kbw & KB_SAME) != 0
            # the aux grid has no sparse skip: the previous sub always
            # executed, so the chain bit alone gates the window load
            skip = jnp.logical_and(same, jnp.logical_or(sI > 0, i > 0))

            @pl.when(jnp.logical_not(skip))
            def _():
                if x2_hbm:
                    dma = pltpu.make_async_copy(
                        x2_ref.at[pl.ds(base, W), :],
                        wscr_ref.at[0:W, :], dma_sem[0])
                    dma.start()
                    dma.wait()
                else:
                    wscr_ref[0:W, :] = x2_ref[pl.ds(base, W), :]

            for k in range(stiles):
                t = sI * stiles + k
                u = jax.lax.bitcast_convert_type(
                    pk_ref[0, 8 * t: 8 * t + 8, :], jnp.uint32)
                rel = (u >> 7).astype(jnp.int32)
                sub = rel & 7
                gsel = rel >> 3
                # LANE-PURE layout: each position's source sits at its
                # own lane, so the gather is a per-lane granule take —
                # no lane routing (see divert_stragglers)
                xv = jnp.zeros((8, LANE), jnp.float32)
                for g in range(W // 8):
                    tbl = wscr_ref[8 * g: 8 * g + 8, :]
                    got = jnp.take_along_axis(tbl, sub, axis=0)
                    xv = jnp.where(gsel == g, got, xv)
                out_ref[0, 8 * t: 8 * t + 8, :] = xv

    return kernel


def _aux_impl(aux_arrays, aux_static, x2, interpret, x2_hbm=None):
    """Plain (non-jitted) aux gather — call this from inside an outer
    jit (a nested-jit call under lax.while_loop trips a lowering-cache
    KeyError in this jax version); ``_aux_call`` wraps it for direct
    use."""
    h, hc, W, naux, rows = aux_static
    kb, pk = aux_arrays
    if x2_hbm is None:
        x2_hbm = h > VMEM_X2_MAX_ROWS and not interpret
    kernel = _make_aux_kernel(W, x2_hbm, rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(naux,),
        in_specs=[pl.BlockSpec((1, rows, LANE), lambda i, kbv: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=(pltpu.ANY if x2_hbm
                                             else pltpu.VMEM))],
        out_specs=pl.BlockSpec((1, rows, LANE), lambda i, kbv: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, LANE), jnp.float32)]
        + ([pltpu.SemaphoreType.DMA(())] if x2_hbm else []),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((naux, rows, LANE), jnp.float32),
        interpret=interpret,
    )(kb, pk, x2)
    return out.reshape(hc, LANE)


_aux_call = functools.partial(jax.jit, static_argnames=(
    "aux_static", "interpret", "x2_hbm"))(_aux_impl)


def aux_gather(aux: CompactAux, x2, interpret: bool = False):
    """Produce the compact operand rows: ``[hc, 128]`` f32, bit-exact
    copies of the selected x2 entries (pad rows carry garbage that no
    main-plan slot references)."""
    arrays = (jnp.asarray(aux.kb), jnp.asarray(aux.pk))
    static = (aux.h, aux.hc, aux.W, aux.naux, aux.rows)
    return _aux_call(arrays, static, x2, interpret)
