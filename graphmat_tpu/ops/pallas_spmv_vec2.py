"""Pallas TPU generalized-SpMV v2 for K-wide vector messages.

The v2 rework of :mod:`pallas_spmv_vec` (SpMSpV3 workloads — SGD
collaborative filtering, LDA: ``src/SGD.cpp:95-117``,
``src/LDA.cpp:128-158``).  The v1 kernel spent ~3.8 us per 128-edge row in
per-group scatter/vp-gather matmul issues; v2 restructures around the
scalar v2 layout ideas:

* **Slot layout**: vectors live in 32-lane blocks (K <= 32), four edge
  slots per 128-lane row; a chunk is ``[rows, 128]`` = ``4 * rows`` edges.
  Vertex vectors are stored ``V4[v // 4, (v % 4) * 32 + k]`` so one
  f32-exact ``take_along_axis`` granule gather fetches four vertices' whole
  vectors at once.

* **Receiver binding**: an edge sits in lane-block ``rc % 4`` and chunks
  draw from one aligned receiver window, so the *receiver* vector gather
  needs no lane routing at all, and the scatter contracts the sublane axis
  against a tiny per-lane-block one-hot of the receiver row — a
  ``[wy, rows] x [rows, 128]`` matmul per lane-block per bf16 split.

* **Sender gather**: the sender's lane-block ``v % 4`` generally differs
  from the slot's, so the sender window is materialized in scratch in four
  32-lane rotations; the plan's sender index carries the rotation in its
  low 2 bits.

* Cells are (receiver block, aligned sender window class, aligned receiver
  window) — all capacity-packed per lane-block like the scalar planner.

Engine programs opt in via ``GraphProgram.pallas_vec2_semiring()``
returning a :class:`~graphmat_tpu.core.program.PallasVec2Semiring`; the
``process`` works on ``[rows, 128]`` tiles where each 32-lane block is one
edge (helpers ``block_sum`` and broadcast ``extra`` provided).
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

__all__ = ["SpmvVec2Plan", "build_spmv_vec2_plan", "planv_call_args",
           "spmv_vec2"]

LANE = 128
KPAD = 32                # lanes per edge slot
SLOTS = LANE // KPAD     # 4 edge slots per row
NC_SEG_MAX = 50_000      # chunks per pallas call (1 MB SMEM prefetch cap)
WYK = 32                 # per-chunk receiver-window rows (vp gather span)
GC = 4                   # chunks per grid step (fixed-cost amortization)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclass
class SpmvVec2Plan:
    n_pad: int           # padded receiver count (multiple of wr)
    n_send_pad: int      # padded SOURCE sender count (= hs_src * 4)
    hs: int              # EXTENDED X4 rows (hs_src + aux.hc; = hs_src
                         #   when no compaction)
    hr: int              # VP2/Y2 rows (= n_pad / 4)
    wr: int              # receiver block width
    nb: int
    nc: int
    rows: int            # chunk sublanes
    wy: int              # per-chunk vp window rows (= WYK)
    nnz: int
    fill: float
    classes: tuple       # sender window classes (X4 rows)
    kindid: Any          # i32[nc]   window class index (0..len-1)
    blkid: Any           # i32[nc]   receiver block (nondecreasing)
    sbase: Any           # i32[nc]   sender window base row (8-aligned)
    rbase: Any           # i32[nc]   receiver window base row (8-aligned)
    # compact planes: 32 chunks per [rows,128] tile, 4 lanes per chunk
    # (one per slot block); the kernel broadcasts to 32-lane blocks with a
    # lane take_along_axis.  pk packs (gather idx << 13) | rcf.
    pk: Any              # i32[ceil(nc/32),rows,128]
    valp: Any            # f32[ceil(nc/32),rows,128]
    rcwt: Any            # i32[ceil(nc/8),8,128]  row c%8, lane b*rows+i
    segs: tuple          # ((c0, c1, b0, b1), ...) block-aligned chunk
                         #   ranges, each <= NC_SEG_MAX (SMEM budget)
    got_static: Any      # bool[n_pad]
    aux: Any = None      # CompactAux: vec2 hypersparse compaction
    hs_src: int = 0      # SOURCE operand rows (= hs when aux is None)


def build_spmv_vec2_plan(senders0, receivers0, vals, n,
                         n_recv: int | None = None, wr: int = 4096,
                         windows=(160, 256, 1024), wy: int = 1024,
                         cell_min: int = 512,
                         rows: int = 32, compact="auto",
                         compact_kw=None) -> SpmvVec2Plan:
    """Pack a 0-based COO edge list into the vec2 chunk layout.

    ``wy`` is the *cell-formation* receiver window (wide, for packing);
    each chunk's vp gather/scatter window is the narrow per-chunk
    ``WYK``-row span recorded in ``rbase`` (receiver-sorted walk).

    ``compact``: hypersparse operand compaction (see
    ``pallas_compact.divert_stragglers_vec2``) — ``'auto'`` turns it on
    above ``VEC_H_COMPACT_MIN`` source rows (``GRAPHMAT_COMPACT``
    resolves the auto default like the scalar path); an explicit bool
    forces it.  When active, ``cell_min`` is raised to ``VEC_CELL_MIN``
    for EVERY cell: a vec2 chunk only saturates its 128 slots near
    ~4096 edges per (block, window) cell, so small-window acceptance at
    the dense-graph threshold would fragment fill on exactly the graphs
    compaction targets (measured at the 10M-rating SGD protocol,
    PERF.md round 5j/5k).
    """
    if n_recv is None:
        n_recv = n
    hs = max(_round_up(_round_up(n, 4) // 4, LANE), LANE)
    hs_src = hs
    n_send_pad = hs * 4
    n_pad = max(_round_up(n_recv, wr), wr)
    nb = n_pad // wr
    hr = n_pad // 4
    e = len(senders0)
    s = np.asarray(senders0, np.int64)
    r = np.asarray(receivers0, np.int64)
    v = np.asarray(vals, np.float32)
    assert wr % (4 * wy) == 0 or wy * 4 >= wr

    from .pallas_compact import (VEC_CELL_MIN, VEC_H_COMPACT_MIN,
                                 divert_stragglers_vec2)
    import os
    env_c = os.environ.get("GRAPHMAT_COMPACT")
    if env_c is not None and compact == "auto":
        compact = env_c not in ("0", "")
    if compact == "auto":
        compact = hs_src >= VEC_H_COMPACT_MIN
    aux = None
    if compact and e > 0:
        ckw = dict(compact_kw or {})
        ckw.setdefault("w_aux", min(1024, hs_src))
        cell_min = max(cell_min, ckw.pop("cell_min", VEC_CELL_MIN))
        s, aux, hs = divert_stragglers_vec2(
            s, r, hs_src, wr, wy, windows, cell_min, **ckw)

    windows = sorted({int(min(w, hs)) for w in windows}) or [min(2048, hs)]

    from ..native import load_planner
    lib = load_planner()
    if lib is not None and e > 0 and hasattr(lib, "gm_planv_create"):
        return _build_planv_native(lib, s, r, v, e, hs, hr, wr, nb,
                                   windows, cell_min, wy, rows, n_pad,
                                   n_send_pad, receivers0, aux=aux,
                                   hs_src=hs_src)
    rblk = r // wr
    rwin = (r // 4) // wy          # aligned receiver window id (global)
    srow = s // 4

    # sender window class per edge: smallest class whose (block, swin,
    # rwin) cell is big enough; last class takes the rest
    kind = np.full(e, -1, np.int64)
    scell = np.zeros(e, np.int64)
    nrw = -(-hr // wy)
    for wi, W in enumerate(windows):
        last = wi == len(windows) - 1
        nsw = -(-hs // W)
        cell = (rwin * nsw + srow // W)
        if not last:
            rem = kind < 0
            if not rem.any():
                break
            cnt_map = {}
            cr = cell[rem]
            uc, cnts = np.unique(cr, return_counts=True)
            big = set(uc[cnts >= cell_min].tolist())
            take = rem & np.isin(cell, list(big)) if big else \
                np.zeros(e, bool)
        else:
            take = kind < 0
        kind[take] = wi
        scell[take] = cell[take]
        if (kind >= 0).all():
            break

    # pack per (rwin, kind, swin-cell): edges receiver-sorted within the
    # cell so a chunk spans a narrow vp window (WYK rows); lane-block
    # queues (rc % 4) with cap = rows per block per chunk
    order = np.lexsort((r, scell, kind, rwin))
    ks, cs, rw_ = kind[order], scell[order], rwin[order]
    key = (rw_ * (len(windows) + 1) + ks) * (2 ** 32) + cs
    bounds = (np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1, e]
              if e else np.zeros(1, np.int64))

    chunks = []   # dicts per chunk
    for gi in range(len(bounds) - 1):
        lo, hi_ = bounds[gi], bounds[gi + 1]
        idxs_g = order[lo:hi_]
        kd = int(ks[lo])
        W = windows[kd]
        se, re_, ve = s[idxs_g], r[idxs_g], v[idxs_g]
        blk = int(re_[0] // wr)
        nsw = -(-hs // W)
        sbase = min(int((se[0] // 4) // W) * W, hs - W)
        # receiver-sorted walk (edges already r-sorted within the cell):
        # one open chunk with per-lane-block counters and an 8-aligned
        # WYK-row vp window anchored at the chunk's first receiver —
        # mirrors the native walk in planner.cpp::gm_planv_create
        bq = (re_ % 4).astype(np.int64)
        blk_end = (blk + 1) * (wr // 4)
        chunk_of = np.empty(len(se), np.int64)
        row_of = np.empty(len(se), np.int64)
        cbase = []
        cnt = [0] * SLOTS
        base = None
        for t in range(len(se)):
            b = int(bq[t])
            rv = int(re_[t] // 4)
            if base is None or cnt[b] == rows or rv >= base + WYK:
                base = min(rv & ~7, blk_end - WYK)
                cbase.append(base)
                cnt = [0] * SLOTS
            chunk_of[t] = len(cbase) - 1
            row_of[t] = cnt[b]
            cnt[b] += 1
        if not cbase:
            cbase = [blk * (wr // 4)]
        ncc = len(cbase)
        # narrow [ncc, rows, 4] arrays, expanded to 128 lanes at the end
        idxs_n = np.zeros((ncc, rows, SLOTS), np.int32)
        val_n = np.zeros((ncc, rows, SLOTS), np.float32)
        rcf_n = np.full((ncc, rows, SLOTS), wr, np.int32)
        rcwt_n = np.full((ncc, 8, LANE), 127, np.int32)
        rot = ((re_ - se) % 4).astype(np.int32)
        idxs_n[chunk_of, row_of, bq] = (((se // 4 - sbase) << 2)
                                        | rot).astype(np.int32)
        val_n[chunk_of, row_of, bq] = ve
        rcf_n[chunk_of, row_of, bq] = (re_ - blk * wr).astype(np.int32)
        # flat layout: row 0, lane (b*rows + i) — the kernel's batched
        # scatter one-hot reads it as [1, SLOTS*rows] without a reshape
        cbase_arr = np.asarray(cbase, np.int64)
        rcwt_n[chunk_of, 0, bq * rows + row_of] = (
            re_ // 4 - cbase_arr[chunk_of]).astype(np.int32)
        for c in range(ncc):
            chunks.append(dict(
                kind=kd, blk=blk, sbase=sbase, rbase=int(cbase_arr[c]),
                idxs=np.repeat(idxs_n[c], KPAD, axis=1),
                val=np.repeat(val_n[c], KPAD, axis=1),
                rcf=np.repeat(rcf_n[c], KPAD, axis=1),
                rcwt=rcwt_n[c]))

    # every block needs >= 1 chunk (acc coverage)
    covered = {c["blk"] for c in chunks}
    for b in range(nb):
        if b not in covered:
            chunks.append(dict(
                kind=0, blk=b, sbase=0, rbase=b * (wr // 4),
                idxs=np.zeros((rows, LANE), np.int32),
                val=np.zeros((rows, LANE), np.float32),
                rcf=np.full((rows, LANE), wr, np.int32),
                rcwt=np.full((8, LANE), 127, np.int32)))
    chunks.sort(key=lambda c: c["blk"])
    nc = len(chunks)

    got = np.zeros(n_pad, bool)
    if e:
        got[np.unique(np.asarray(receivers0))] = True
    blkid_np = np.array([c["blk"] for c in chunks], np.int32)
    pk, valp, rcwt = _compact_planes(
        np.stack([c["idxs"] for c in chunks]),
        np.stack([c["val"] for c in chunks]),
        np.stack([c["rcf"] for c in chunks]),
        np.stack([c["rcwt"][0] for c in chunks]), rows)
    kindid_np = np.array([c["kind"] for c in chunks], np.int32)
    sbase_np = np.array([c["sbase"] for c in chunks], np.int32)
    rbase_np = np.array([c["rbase"] for c in chunks], np.int32)
    (kindid_np, blkid_np, sbase_np, rbase_np, pk, valp, rcwt,
     nc) = _align_chunk_groups(kindid_np, blkid_np, sbase_np, rbase_np,
                               pk, valp, rcwt, nc, rows, wr)
    rcwt = _encode_range_scatter(rcwt, nc, rows)
    return _maybe_validate(SpmvVec2Plan(
        n_pad=n_pad, n_send_pad=n_send_pad, hs=hs, hr=hr, wr=wr, nb=nb,
        nc=nc, rows=rows, wy=WYK, nnz=e,
        fill=e / max(nc * rows * SLOTS, 1), classes=tuple(windows),
        segs=_segments(blkid_np, nb),
        kindid=jnp.asarray(kindid_np),
        blkid=jnp.asarray(blkid_np),
        sbase=jnp.asarray(sbase_np),
        rbase=jnp.asarray(rbase_np),
        pk=jnp.asarray(pk), valp=jnp.asarray(valp),
        rcwt=jnp.asarray(rcwt),
        got_static=jnp.asarray(got), aux=aux, hs_src=hs_src))


def _build_planv_native(lib, s, r, v, e, hs, hr, wr, nb, windows,
                        cell_min, wy, rows, n_pad, n_send_pad,
                        receivers0, aux=None, hs_src=None):
    """C++/OpenMP vec2 plan build (graphmat_tpu/native/planner.cpp)."""
    import ctypes

    sa = np.ascontiguousarray(s, np.int32)
    ra = np.ascontiguousarray(r, np.int32)
    va = np.ascontiguousarray(v, np.float32)
    wins = np.ascontiguousarray(windows, np.int32)
    nc_out = ctypes.c_int64()
    handle = lib.gm_planv_create(sa, ra, va, e, hs, hr, wr, nb, wins,
                                 len(wins), cell_min, wy, rows,
                                 ctypes.byref(nc_out))
    nc = int(nc_out.value)
    try:
        kindid = np.empty(nc, np.int32)
        blkid = np.empty(nc, np.int32)
        sbase = np.empty(nc, np.int32)
        rbase = np.empty(nc, np.int32)
        pk = np.empty((-(-nc // 32), rows, LANE), np.int32)
        valp = np.empty((-(-nc // 32), rows, LANE), np.float32)
        rcwt2 = np.empty((-(-nc // 8), 8, LANE), np.int32)
        lib.gm_planv_fill2(handle, kindid, blkid, sbase, rbase,
                           pk.reshape(-1), valp.reshape(-1),
                           rcwt2.reshape(-1))
    finally:
        lib.gm_planv_destroy(handle)
    got = np.zeros(n_pad, bool)
    got[np.unique(np.asarray(receivers0))] = True
    (kindid, blkid, sbase, rbase, pk, valp, rcwt2,
     nc) = _align_chunk_groups(kindid, blkid, sbase, rbase, pk, valp,
                               rcwt2, nc, rows, wr)
    rcwt2 = _encode_range_scatter(rcwt2, nc, rows)
    return _maybe_validate(SpmvVec2Plan(
        n_pad=n_pad, n_send_pad=n_send_pad, hs=hs, hr=hr, wr=wr, nb=nb,
        nc=nc, rows=rows, wy=WYK, nnz=e,
        fill=e / max(nc * rows * SLOTS, 1),
        classes=tuple(int(w) for w in windows),
        segs=_segments(blkid, nb),
        kindid=jnp.asarray(kindid), blkid=jnp.asarray(blkid),
        sbase=jnp.asarray(sbase), rbase=jnp.asarray(rbase),
        pk=jnp.asarray(pk), valp=jnp.asarray(valp),
        rcwt=jnp.asarray(rcwt2),
        got_static=jnp.asarray(got), aux=aux,
        hs_src=(hs_src if hs_src is not None else hs)))


def _maybe_validate(plan):
    from ..utils.debug import debug_enabled, validate_planv
    if debug_enabled():
        validate_planv(plan)
    return plan




RCF_BITS = 13            # pk = (gidx << RCF_BITS) | rcf; rcf <= wr = 4096


def _compact_planes(idxs, val, rcf, rcwt_row0, rows):
    """[nc,rows,128]-replicated planes -> packed tiles (32 chunks/tile)."""
    nc = idxs.shape[0]
    nidx = idxs[:, :, ::KPAD]           # [nc, rows, 4]
    nval = val[:, :, ::KPAD]
    nrcf = rcf[:, :, ::KPAD]
    pk = (nidx.astype(np.int64) << RCF_BITS) | nrcf.astype(np.int64)
    assert pk.max(initial=0) < 2 ** 31
    npk = -(-nc // 32)
    pad = npk * 32 - nc
    if pad:
        pk = np.concatenate(
            [pk, np.zeros((pad, rows, SLOTS), np.int64)])
        nval = np.concatenate(
            [nval, np.zeros((pad, rows, SLOTS), np.float32)])
    pk = (pk.reshape(npk, 32, rows, SLOTS).transpose(0, 2, 1, 3)
          .reshape(npk, rows, LANE).astype(np.int32))
    valp = (nval.reshape(npk, 32, rows, SLOTS).transpose(0, 2, 1, 3)
            .reshape(npk, rows, LANE).astype(np.float32))
    nr8 = -(-nc // 8)
    pad8 = nr8 * 8 - nc
    rw = rcwt_row0
    if pad8:
        rw = np.concatenate([rw, np.full((pad8, LANE), 127, np.int32)])
    rcwt = rw.reshape(nr8, 8, LANE).astype(np.int32)
    return pk, valp, rcwt


def _align_chunk_groups(kindid, blkid, sbase, rbase, pk, valp, rcwt,
                        nc, rows, wr):
    """Insert inert pad chunks so every receiver block's chunk count is
    a multiple of GC — the kernel then runs GC chunks per grid step
    (one accumulator block per step), quartering the ~0.35 µs/chunk
    fixed pipeline cost that dominates the vec2 residual (PERF round 3:
    10.5 of 20.3 ms on the SGD 1M protocol at 29.8K chunks)."""
    counts = np.bincount(blkid, minlength=int(blkid.max()) + 1 if nc
                         else 1)
    pads = (-counts) % GC
    if nc % GC == 0 and pads.sum() == 0:
        return kindid, blkid, sbase, rbase, pk, valp, rcwt, nc
    # decode packed planes back to per-chunk narrow rows
    ntile = pk.shape[0]
    npk_n = (pk.reshape(ntile, rows, 32, SLOTS).transpose(0, 2, 1, 3)
             .reshape(ntile * 32, rows, SLOTS))[:nc]
    nval_n = (valp.reshape(ntile, rows, 32, SLOTS).transpose(0, 2, 1, 3)
              .reshape(ntile * 32, rows, SLOTS))[:nc]
    nr8 = rcwt.shape[0]
    rw_n = rcwt.reshape(nr8 * 8, LANE)[:nc]

    nc2 = int(nc + pads.sum())
    starts_old = np.r_[0, np.cumsum(counts)]
    starts_new = np.r_[0, np.cumsum(counts + pads)]
    new_of_old = (np.arange(nc)
                  + (starts_new[:-1] - starts_old[:-1])[blkid])
    kind2 = np.zeros(nc2, np.int32)
    blk2 = np.zeros(nc2, np.int32)
    sb2 = np.zeros(nc2, np.int32)
    rb2 = np.zeros(nc2, np.int32)
    # pad defaults: block's own base window, smallest class, no slots
    for b in np.flatnonzero(counts + pads):
        blk2[starts_new[b]: starts_new[b + 1]] = b
        rb2[starts_new[b]: starts_new[b + 1]] = b * (wr // 4)
    kind2[new_of_old] = kindid
    blk2[new_of_old] = blkid
    sb2[new_of_old] = sbase
    rb2[new_of_old] = rbase
    pk2 = np.full((nc2, rows, SLOTS),
                  np.int32(wr), np.int32)       # rcf = wr -> masked
    val2 = np.zeros((nc2, rows, SLOTS), np.float32)
    rw2 = np.full((nc2, LANE), 127, np.int32)
    pk2[new_of_old] = npk_n
    val2[new_of_old] = nval_n
    rw2[new_of_old] = rw_n
    # re-encode the packed tile layouts
    npk2 = -(-nc2 // 32)
    padt = npk2 * 32 - nc2
    if padt:
        pk2 = np.concatenate(
            [pk2, np.zeros((padt, rows, SLOTS), np.int32)])
        val2 = np.concatenate(
            [val2, np.zeros((padt, rows, SLOTS), np.float32)])
    pk2 = (pk2.reshape(npk2, 32, rows, SLOTS).transpose(0, 2, 1, 3)
           .reshape(npk2, rows, LANE))
    val2 = (val2.reshape(npk2, 32, rows, SLOTS).transpose(0, 2, 1, 3)
            .reshape(npk2, rows, LANE))
    nr82 = -(-nc2 // 8)
    pad8 = nr82 * 8 - nc2
    if pad8:
        rw2 = np.concatenate([rw2, np.full((pad8, LANE), 127, np.int32)])
    rcwt2 = rw2.reshape(nr82, 8, LANE)
    return kind2, blk2, sb2, rb2, pk2, val2, rcwt2, nc2


def _encode_range_scatter(rcwt, nc, rows):
    """Re-encode the per-chunk receiver-row plane (lane ``b*rows + i``
    -> wy row, 127 = empty) as per-(wy-row, block) SLOT-ROW RANGES
    (lane ``b*32 + w`` -> ``lo | hi1 << 6``): within each lane-block
    queue the walk appends receiver-sorted, so a receiver's slots are a
    contiguous row run — the kernel then scatters with one sublane
    prefix-sum and two takes instead of a bf16 one-hot matmul (exact
    f32, and ~2.5 ms cheaper on the SGD 1M protocol)."""
    assert rows == WYK == 32, "range scatter assumes rows == WYK == 32"
    nr8 = rcwt.shape[0]
    rcw_n = rcwt.reshape(nr8 * 8, LANE)[:nc]
    seq = rcw_n.reshape(nc, SLOTS, rows)        # [nc, b, i] wy rows
    w = np.arange(32, dtype=np.int32)
    enc = np.empty((nc, SLOTS, 32), np.int32)
    step = 4096                                 # bound temp memory
    for c0_ in range(0, nc, step):
        sl = seq[c0_: c0_ + step, :, :, None]
        lo = (sl < w).sum(axis=2, dtype=np.int32)
        hi1 = (sl <= w).sum(axis=2, dtype=np.int32)
        enc[c0_: c0_ + step] = lo | (hi1 << 6)
    rw2 = enc.reshape(nc, LANE)
    pad8 = nr8 * 8 - nc
    if pad8:
        rw2 = np.concatenate([rw2, np.zeros((pad8, LANE), np.int32)])
    return rw2.reshape(nr8, 8, LANE)


def _segments(blkid: np.ndarray, nb: int, nc_max: int | None = None):
    """Split chunks into block-aligned ranges of <= nc_max (the scalar
    prefetch arrays live in 1 MB SMEM)."""
    if nc_max is None:
        nc_max = NC_SEG_MAX
    nc = len(blkid)
    if nc <= nc_max:
        return ((0, nc, 0, nb),)
    starts = np.searchsorted(blkid, np.arange(nb + 1))
    segs = []
    c0, b0 = 0, 0
    for b in range(1, nb + 1):
        if starts[b] - c0 > nc_max:
            assert starts[b - 1] > c0, "single block exceeds the SMEM cap"
            segs.append((int(c0), int(starts[b - 1]), int(b0), b - 1))
            c0, b0 = int(starts[b - 1]), b - 1
    segs.append((int(c0), nc, int(b0), nb))
    return tuple(segs)


# ------------------------------------------------------------------ kernel

def _split_bf16(x, n_splits):
    parts = []
    rem = x
    for _ in range(n_splits - 1):
        u = jax.lax.bitcast_convert_type(rem, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000),
                                          jnp.float32)
        parts.append(hi.astype(jnp.bfloat16))
        rem = rem - hi
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _make_vec2_kernel(process: Callable, wr: int, wy: int, rows: int,
                      classes, n_splits: int, has_extra: bool,
                      interpret: bool = False, c0: int = 0,
                      debug: str | None = None, kb: int = 1, hs: int = 0,
                      hr: int = 0):
    """``debug`` (ablation knobs, perf decomposition only — results are
    wrong): 'nogather' skips the sender window walk, 'novp' skips the
    receiver-vector gather, 'noscatter' skips the scatter matmul.

    ``kb`` is the K-block count (round 5): K > 32 vectors are split into
    ``kb`` 32-lane planes sharing ONE plan — x4/vp4 stack the planes on
    the row axis ([kb*hs, 128] / [kb*hr, 128]), the sender/receiver
    gathers and the scatter loop over planes (per-edge cost scales with
    the data actually moved), and ``process`` receives LISTS of
    per-plane tiles so cross-K couplings (SGD's rating dot, LDA's gamma
    normalization) stay inside one kernel invocation.  Reference analog:
    any-K ``LatentVector<Size>`` payloads, multinode/spmspv3.h:41-267."""
    ntiles = rows // 8
    wmax = max(classes)

    def kernel(kind_ref, blk_ref, sbase_ref, rbase_ref, pk_ref, valp_ref,
               rcwt_ref, x4_ref, vp4_ref, *rest):
        if has_extra:
            extra_ref = rest[0]
            rest = rest[1:]
        y_ref, acc_ref, wscr_ref, vscr_ref, dma_sem = (
            rest[0], rest[1], rest[2], rest[3], rest[4])
        i = pl.program_id(0)
        # GC chunks per grid step, all in ONE receiver block (the plan
        # pads each block's chunk count to a GC multiple), so the
        # first/flush checks and accumulator handoff run once per step
        jc0 = i * GC
        first = jnp.logical_or(
            i == 0, blk_ref[jc0] != blk_ref[jnp.maximum(jc0 - 1, 0)])

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        ones_blk = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
                    // KPAD == jax.lax.broadcasted_iota(
                        jnp.int32, (LANE, LANE), 1) // KPAD
                    ).astype(jnp.bfloat16)

        def block_sum(a):
            """Sum within each 32-lane block, broadcast back to lanes.
            Exact up to the bf16 split depth (ones are exact)."""
            parts = _split_bf16(a.astype(jnp.float32), n_splits)
            stacked = jnp.concatenate(parts, axis=0)   # [ns*rows, 128]
            t = jax.lax.dot_general(stacked, ones_blk,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = t[0:rows]
            for k in range(1, n_splits):
                out = out + t[k * rows:(k + 1) * rows]
            return out

        def one_chunk(k):
            jc = jc0 + k                  # segment-local chunk id
            gc = c0 + jc                  # global chunk id
            # unpack the compact planes: 32 chunks per tile, lanes
            # (chunk % 32) * 4 + slot-block; broadcast to 32-lane blocks
            off32 = (gc % 32) * SLOTS
            bigidx = off32 + lane_i // KPAD   # [rows, 128]
            pkb = jnp.take_along_axis(pk_ref[0], bigidx, axis=1)
            idxs_full = pkb >> RCF_BITS
            rcf = pkb & ((1 << RCF_BITS) - 1)
            ev = jnp.take_along_axis(valp_ref[0], bigidx, axis=1)

            idx_tiles = [idxs_full[8 * t: 8 * t + 8, :]
                         for t in range(ntiles)]
            subs = [(t >> 2) & 7 for t in idx_tiles]
            # fused (granule, rotation) key: one compare per (g, c) pass
            keys = [((t >> 5) << 2) | (t & 3) for t in idx_tiles]

            # ---- sender gather: DMA window(s), then 4 rotated copies
            # per K-plane (plane p occupies wscr rows [p*4*wmax, ...)) --
            prev = jnp.maximum(jc - 1, 0)
            same_win = jnp.logical_and(
                jc > 0, jnp.logical_and(kind_ref[jc] == kind_ref[prev],
                                        sbase_ref[jc] == sbase_ref[prev]))

            def sender_branch(W):
                def inner():
                    sb = pl.multiple_of(sbase_ref[jc], 8)

                    @pl.when(jnp.logical_not(same_win))
                    def _():
                        for p in range(kb):
                            pb = p * 4 * wmax
                            if interpret:
                                wscr_ref[pb:pb + W, :] = x4_ref[
                                    pl.ds(p * hs + sb, W), :]
                            else:
                                dma = pltpu.make_async_copy(
                                    x4_ref.at[pl.ds(p * hs + sb, W), :],
                                    wscr_ref.at[pb:pb + W, :], dma_sem)
                                dma.start()
                                dma.wait()
                            cur = wscr_ref[pb:pb + W, :]
                            for cidx in range(1, 4):
                                cur = pltpu.roll(cur, KPAD, 1)
                                wscr_ref[pl.ds(pb + cidx * wmax, W),
                                         :] = cur
                    out = []
                    for p in range(kb):
                        pb = p * 4 * wmax
                        xvs = [jnp.zeros((8, LANE), jnp.float32)
                               for _ in range(ntiles)]
                        for g in range(W // 8):
                            for cidx in range(4):
                                tbl = wscr_ref[pb + cidx * wmax + 8 * g:
                                               pb + cidx * wmax + 8 * g
                                               + 8, :]
                                kk = (g << 2) | cidx
                                for t in range(ntiles):
                                    got = jnp.take_along_axis(
                                        tbl, subs[t], axis=0)
                                    xvs[t] = jnp.where(keys[t] == kk,
                                                       got, xvs[t])
                        out.extend(xvs)
                    return tuple(out)
                return inner

            if debug == "nogather":
                xv_l = [jnp.full((rows, LANE), 1.0, jnp.float32)] * kb
            else:
                branches = [sender_branch(W) for W in classes]
                flat = list(jax.lax.switch(kind_ref[jc], branches))
                xv_l = [jnp.concatenate(flat[p * ntiles:(p + 1) * ntiles],
                                        axis=0) for p in range(kb)]

            # ---- receiver-vector gather: per-chunk WYK-row window ----
            rb = pl.multiple_of(rbase_ref[jc], 8)
            same_vwin = jnp.logical_and(
                jc > 0, rbase_ref[jc] == rbase_ref[prev])

            @pl.when(jnp.logical_not(same_vwin))
            def _():
                for p in range(kb):
                    if interpret:
                        vscr_ref[p * wy:(p + 1) * wy, :] = vp4_ref[
                            pl.ds(p * hr + rb, wy), :]
                    else:
                        dma_v = pltpu.make_async_copy(
                            vp4_ref.at[pl.ds(p * hr + rb, wy), :],
                            vscr_ref.at[p * wy:(p + 1) * wy, :], dma_sem)
                        dma_v.start()
                        dma_v.wait()
            # rcf is block-local; rb is a global VP row base
            blk_rb = rb - jnp.int32(blk_ref[jc]) * (wr // 4)
            idxv = (rcf >> 2) - blk_rb                  # [rows,128]
            vpr_l = []
            for p in range(kb):
                if debug == "novp":
                    vpr_l.append(jnp.full((rows, LANE), 1.0, jnp.float32))
                    continue
                vpr_tiles = []
                for t in range(ntiles):
                    iv = idxv[8 * t: 8 * t + 8, :]
                    q = jnp.zeros((8, LANE), jnp.float32)
                    for g in range(wy // 8):
                        got = jnp.take_along_axis(
                            vscr_ref[p * wy + 8 * g: p * wy + 8 * g + 8,
                                     :], iv & 7, axis=0)
                        q = jnp.where((iv >> 3) == g, got, q)
                    vpr_tiles.append(q)
                vpr_l.append(jnp.concatenate(vpr_tiles, axis=0))

            # ---- process (per 32-lane edge blocks) ----
            rid = jnp.int32(blk_ref[jc]) * wr + rcf     # global recv id

            if kb == 1:
                extra = extra_ref[0:1, :] if has_extra else None
                outs = [process(xv_l[0], ev, vpr_l[0], extra, rid,
                                block_sum)]
            else:
                extra_l = ([extra_ref[p:p + 1, :] for p in range(kb)]
                           if has_extra else None)
                outs = list(process(xv_l, ev, vpr_l, extra_l, rid,
                                    block_sum))

            # ---- scatter: sublane prefix-sum + range takes.  Column
            # lane of p already belongs to its slot-block, and each
            # receiver's slots form a contiguous row run within the
            # block queue (receiver-sorted walk) — so per (wy-row,
            # block) the contribution is pref(hi1) - pref(lo), a
            # difference of two f32 running prefix sums.  This is exact
            # relative to the bf16 one-hot matmul it replaced (no 2^-17
            # split error), but NOT exact summation: a small-magnitude
            # receiver range following large-magnitude slots cancels
            # (error ~ eps * max |prefix| over the run — bounded by the
            # <=rows-slot run length; same-session A/B in PERF.md).
            renc = jnp.broadcast_to(
                rcwt_ref[0, pl.ds(gc % 8, 1), :], (wy, LANE))
            wrow = jax.lax.broadcasted_iota(jnp.int32, (wy, LANE), 0)
            encv = jnp.take_along_axis(
                renc, (lane_i[0:wy] & np.int32(~31)) | wrow, axis=1)
            lo = encv & 63
            hi1 = (encv >> 6) & 63

            for p in range(kb):
                pp = outs[p].astype(jnp.float32)
                pp = jnp.where(rcf < wr, pp, 0.0)       # mask pads
                arow = p * (wr // 4) + blk_rb
                if debug == "noscatter":
                    cur = acc_ref[pl.ds(arow, wy), :]
                    acc_ref[pl.ds(arow, wy), :] = cur + pp[0:wy, :]
                    continue
                csum = pp                 # inclusive prefix over rows
                sh = 1
                while sh < rows:
                    csum = csum + jnp.concatenate(
                        [jnp.zeros((sh, LANE), jnp.float32), csum[:-sh]],
                        axis=0)
                    sh *= 2

                def pref(t, csum=csum):   # sum pp[0..t-1], t in [0, 32]
                    # cross-sublane gather decomposed into 8-row
                    # granules (Mosaic's gather spans one granule)
                    tm = jnp.maximum(t - 1, 0)
                    tiles = []
                    for to in range(wy // 8):
                        tt = tm[8 * to: 8 * to + 8, :]
                        sub = tt & 7
                        gsel = tt >> 3
                        q = jnp.zeros((8, LANE), jnp.float32)
                        for g in range(rows // 8):
                            got = jnp.take_along_axis(
                                csum[8 * g: 8 * g + 8, :], sub, axis=0)
                            q = jnp.where(gsel == g, got, q)
                        tiles.append(q)
                    out = jnp.concatenate(tiles, axis=0)
                    return jnp.where(t > 0, out, 0.0)

                contrib = pref(hi1) - pref(lo)
                cur = acc_ref[pl.ds(arow, wy), :]
                acc_ref[pl.ds(arow, wy), :] = cur + contrib

        for k in range(GC):
            one_chunk(k)

        # flush only on the block's last step (blkid nondecreasing; an
        # unconditional copy is 512 KB per chunk — measured +13% kernel
        # time on SGD-CF)
        npr = pl.num_programs(0)
        nxt = jnp.minimum(jc0 + GC, npr * GC - 1)
        last = jnp.logical_or(i == npr - 1,
                              blk_ref[nxt] != blk_ref[jc0])

        @pl.when(last)
        def _():
            y_ref[0] = acc_ref[:]

    return kernel


def planv_call_args(plan: SpmvVec2Plan):
    """(plan_arrays, plan_static) for ``_spmv_vec2_call`` — appends the
    compaction aux arrays/static when the plan carries them."""
    arrays = (plan.kindid, plan.blkid, plan.sbase, plan.rbase,
              plan.pk, plan.valp, plan.rcwt)
    static = (plan.hs, plan.hr, plan.wr, plan.nb, plan.nc,
              plan.n_pad, plan.rows, plan.wy, plan.classes, plan.segs)
    aux = plan.aux
    if aux is not None:
        if not isinstance(aux.kb, jnp.ndarray):   # one-time device upload
            aux.kb = jnp.asarray(aux.kb)
            aux.pk = jnp.asarray(aux.pk)
        arrays = arrays + (aux.kb, aux.pk)
        static = static + ((aux.h, aux.hc, aux.W, aux.naux, aux.rows),)
    return arrays, static


@functools.partial(jax.jit, static_argnames=("plan_static", "process",
                                              "n_splits", "interpret",
                                              "has_extra", "debug", "kb"))
def _spmv_vec2_call(plan_arrays, plan_static, x, vp, extra, process,
                    n_splits, interpret, has_extra, debug=None, kb=1):
    if len(plan_static) > 10:
        # hypersparse compaction: materialize the virtual compact rows
        # per K-plane and extend the operand (aux.h source rows ->
        # plan.hs extended rows; the kernel's plane stride is hs)
        from .pallas_compact import _aux_impl
        aux_static = plan_static[10]
        plan_static = plan_static[:10]
        aux_arrs = plan_arrays[7:9]
        plan_arrays = plan_arrays[:7]
        h_src, hc = aux_static[0], aux_static[1]
        x4s = x.reshape(kb, h_src, LANE)
        planes = []
        for p in range(kb):
            xc = _aux_impl(aux_arrs, aux_static, x4s[p], interpret)
            planes.append(jnp.concatenate([x4s[p], xc], axis=0))
        x = jnp.concatenate(planes, axis=0).reshape(-1)
    if len(plan_static) > 9:
        segs = plan_static[9]
        base_static = plan_static[:9]
        if len(segs) > 1:
            kindid, blkid, sbase, rbase, pk, valp, rcwt = plan_arrays
            outs = []
            hs, hr, wr, nb, nc, n_pad, rows, wy, classes = base_static
            for (c0, c1, b0, b1) in segs:
                sub = (kindid[c0:c1], blkid[c0:c1], sbase[c0:c1],
                       rbase[c0:c1], pk, valp, rcwt)
                seg_static = (hs, hr, wr, b1 - b0, c1 - c0,
                              (b1 - b0) * wr, rows, wy, classes)
                outs.append(_spmv_vec2_seg(sub, seg_static, x, vp, extra,
                                           process, n_splits, interpret,
                                           has_extra, b0, c0, debug, kb))
            y = jnp.concatenate(outs, axis=0)
            return y[: n_pad]
        plan_static = base_static
    return _spmv_vec2_seg(plan_arrays, plan_static, x, vp, extra, process,
                          n_splits, interpret, has_extra, 0, 0, debug, kb)


def _spmv_vec2_seg(plan_arrays, plan_static, x, vp, extra, process,
                   n_splits, interpret, has_extra, b0=0, c0=0,
                   debug=None, kb=1):
    hs, hr, wr, nb, nc, n_pad, rows, wy, classes = plan_static
    kindid, blkid, sbase, rbase, pk, valp, rcwt = plan_arrays
    x4 = x.reshape(kb * hs, LANE)
    vp4 = vp.reshape(kb * hr, LANE)

    kernel = _make_vec2_kernel(process, wr, wy, rows, classes, n_splits,
                               has_extra, interpret, c0, debug, kb, hs,
                               hr)
    wmax = max(classes)
    assert nc % GC == 0 and c0 % GC == 0, \
        "vec2 plans must be GC-aligned (see _align_chunk_groups)"
    # a step's GC chunks share one pk tile (GC | 32) and one rcwt tile
    # ((c0 + i*GC) % 8 in {0, 4})
    pk_spec = pl.BlockSpec((1, rows, LANE),
                           lambda i, *_: ((c0 + i * GC) // 32, 0, 0),
                           memory_space=pltpu.VMEM)
    rcwt_spec = pl.BlockSpec((1, 8, LANE),
                             lambda i, *_: ((c0 + i * GC) // 8, 0, 0),
                             memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=(pltpu.VMEM if interpret
                                          else pltpu.ANY))
    in_specs = [pk_spec, pk_spec, rcwt_spec, any_spec, any_spec]
    operands = [kindid, blkid, sbase, rbase, pk, valp, rcwt, x4, vp4]
    if has_extra:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(extra.reshape(kb, LANE))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc // GC,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kb * (wr // 4), LANE),
                               lambda i, kind, blk, sb, rb:
                               (blk[i * GC] - b0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kb * (wr // 4), LANE), jnp.float32),
                        pltpu.VMEM((kb * 4 * wmax, LANE), jnp.float32),
                        pltpu.VMEM((kb * wy, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, kb * (wr // 4), LANE),
                                       jnp.float32),
        interpret=interpret,
    )(*operands)
    if kb == 1:
        # [nb, wr/4, 128] -> vertex-major [n_pad, 32]
        return out.reshape(-1, KPAD)[:n_pad]
    # [nb, kb*wr/4, 128] -> [n_pad, kb*32] (plane p -> columns 32p..)
    out = out.reshape(nb, kb, wr // 4, LANE)
    planes = [out[:, p].reshape(-1, KPAD)[:n_pad] for p in range(kb)]
    return jnp.concatenate(planes, axis=1)


def _pack_planes(a, target_rows, kb):
    """[n, K] -> flat [kb * rows4 * 128] plane-stacked vec2 layout
    (plane p packs columns 32p..32p+31, four vertices per 128-lane
    row)."""
    a = jnp.asarray(a, jnp.float32)
    a = jnp.pad(a, ((0, target_rows - a.shape[0]),
                    (0, kb * KPAD - a.shape[1])))
    # [rows4, kb, 128] per plane rows: vertex v -> row v//4, lanes
    # (v%4)*32..: reshape via [rows4, 4, kb, 32]
    a = a.reshape(target_rows // 4, 4, kb, KPAD)
    a = jnp.transpose(a, (2, 0, 1, 3))      # [kb, rows4, 4, 32]
    return a.reshape(-1)


def spmv_vec2(plan: SpmvVec2Plan, x, process: Callable, vp_receiver,
              extra=None, interpret: bool = False, n_splits: int = 2):
    """K-wide 3-operand SpMV: ``y[r, :] += process(x[s], ev, vp[r], ...)``.

    ``x``/``vp_receiver``: f32[n, K]; returns f32[n_pad, 32*ceil(K/32)]
    (first K columns meaningful).  For K <= 32
    ``process(xv, ev, vpr, extra, rid, block_sum)`` works on [rows, 128]
    tiles (32-lane edge blocks); for K > 32 ``xv``/``vpr`` (and
    ``extra``) are LISTS of ceil(K/32) such tiles and the return is a
    matching list — cross-plane couplings (dot products,
    normalizations) are ordinary python sums over the list inside one
    kernel invocation.
    """
    kb = max(1, -(-x.shape[1] // KPAD),
             -(-jnp.asarray(vp_receiver).shape[1] // KPAD))
    xw = _pack_planes(x, plan.n_send_pad, kb)
    vw = _pack_planes(vp_receiver, plan.n_pad, kb)
    plan_arrays, plan_static = planv_call_args(plan)
    ex = None
    if extra is not None:
        exf = jnp.pad(jnp.asarray(extra, jnp.float32).reshape(-1),
                      (0, kb * KPAD - len(extra)))
        ex = jnp.concatenate([jnp.tile(exf[p * KPAD:(p + 1) * KPAD],
                                       SLOTS) for p in range(kb)])
    return _spmv_vec2_call(plan_arrays, plan_static, xw, vw, ex, process,
                           n_splits, interpret, extra is not None,
                           kb=kb)
