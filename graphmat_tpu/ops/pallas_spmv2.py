"""Pallas TPU generalized-SpMV v2 — VPU-gather / MXU-scatter kernel.

Replaces the v1 one-hot-matmul gather (``pallas_spmv.py``), whose cost was
``window x n_splits*128`` MACs *per edge* — the measured wall at RMAT-20
scale.  v2 re-expresses the gather as a *cross-sublane dynamic gather*
(``take_along_axis`` over 8-row granules of the lane-tiled operand
``X2[h, l] = x[h*128 + l]``, an exact-f32 VPU op) and moves all remaining
MXU work into one factored scatter matmul per 2048-edge chunk.

Plan layout (host-built, once per graph):

* Edges are sorted by (receiver-block of width ``wr``, sender) and placed
  into 2048-slot chunks shaped ``[16, 128]`` where **each edge sits in the
  lane of its sender** (``s & 127``) — the reference's COOSIMD32
  conflict-free 32-bin reordering (``COOSIMD32Tile.h:235-318``) transposed
  onto vector lanes.  The gather then needs no lane extraction:
  ``take_along_axis(granule, row_idx, axis=0)`` fetches each edge's sender
  value exactly, in f32.

* **Hub chunks**: senders below ``hub`` (default 2048) gather from a static
  table.  The top 128 senders are replicated across *all* lanes
  (``xtop[m, j] = x[m]``) so the planner may put a hub edge in any lane —
  hub degrees would otherwise pile thousands of edges onto one lane and
  destroy chunk fill.

* **Window chunks**: remaining edges get the smallest aligned sender
  window (class sizes ``windows``, in 128-sender X2 rows) whose
  (block, window) cell holds enough edges to fill chunks; sparse cells
  escalate to coarser classes, the coarsest being the full operand.  The
  kernel walks ``ngran[i]`` 8-row granules from ``base[i]`` with dynamic
  slices of X2 — no window copy, no MXU participation.

* **Scatter (⊕ = sum)**: per chunk, products are reshaped to ``[1, 2048]``,
  split exactly into ``n_splits`` bf16 planes, masked into ``wr/128``
  receiver groups, and contracted against a 128-wide lane one-hot in a
  single ``[splits*G, 2048] x [128, 2048]`` MXU matmul.  Padded slots carry
  receiver sentinel ``wr``, which matches no group — no mask stream.

* **Narrow scatter** (``sub_min > 0``; off by default): split dense
  (cell, receiver-subwindow) queues into chunks spanning only 8 receiver
  groups, scattered by a ``[splits*8, chunk] x [128, chunk]`` matmul into
  ``acc[goff:goff+8]``.  Measured on v5e this does NOT pay at wr=4096:
  the MXU cost of the scatter is ``ceil(M/128)`` output tiles — one tile
  for M = splits*G = 64 as much as for M = 16 — so narrowing saves no
  MXU time while the split queues add chunks (5.28 -> 6.06 ms/iter on
  RMAT-20).  Kept behind ``sub_min`` for layouts where M > 128.

* The gather index and receiver offset ride one packed int32 plane
  ``pk = idx << PK_BITS | rcf`` (idx < 2048, rcf <= wr <= 16383), cutting
  the per-slot plan stream from 12 to 8 bytes.

Chunks of one receiver block are consecutive in the grid, so the block's
``[G, 128]`` accumulator lives in VMEM scratch across chunks, mirroring the
reference's 32-row-aligned private partitions (``DCSCTile.h:247-249``).

min/max semirings and the K-wide vector path still run on the v1 kernels;
the engine picks per semiring.
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

__all__ = ["Spmv2Plan", "build_spmv2_plan", "spmv2"]

LANE = 128
ROWS = 16                 # chunk sublanes
CHUNK = ROWS * LANE       # 2048 edge slots per chunk
HUB_GRANULES = 20         # 16 xtop + 2 lane-bound + 2 rotated x2 granules
VMEM_X2_MAX_ROWS = 16384  # beyond this the operand stays in HBM (8 MB f32)
                          # and windows are DMA'd per chunk
KIND_HUB = 0
KIND_WINDOW = 1
GN = 8                    # narrow-scatter group span (8 groups = 1024 recv)
PK_BITS = 14              # low bits of the packed plane hold rcf


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclass
class Spmv2Plan:
    n_pad: int            # padded receiver count (multiple of wr)
    n_send_pad: int       # h * 128
    h: int                # X2 rows
    wr: int               # receiver block width (G = wr/128 groups)
    nb: int
    nc: int
    hub: int              # hub sender boundary
    nnz: int
    fill: float
    classes: tuple        # window class sizes (static, kernel branches)
    rows: int             # chunk sublanes (16 or 32)
    has_narrow: bool      # any chunk uses the narrow (goff >= 0) scatter
    kindid: Any           # i32[nc]  0 = hub, 1+k = window class k
    blkid: Any            # i32[nc]  receiver block (nondecreasing)
    base: Any             # i32[nc]  X2 window base row (8-aligned)
    goff: Any             # i32[nc]  narrow group offset (mult of 8) or -1
    pk: Any               # i32[nc,rows,128] idx<<PK_BITS | rcf; pads = wr
    val: Any              # f32[nc,rows,128] edge values (pads 0)
    got_static: Any       # bool[n_pad]


def _pack_lanes(cell, lane, n_cells, cap=ROWS):
    """Lane-binned chunk packing.  Within each (cell, lane) queue the k-th
    edge goes to chunk ``chunk_base[cell] + k // cap``, row ``k % cap``.
    Returns (chunk, row, chunks_per_cell)."""
    key = cell.astype(np.int64) * LANE + lane
    order = np.argsort(key, kind="stable")
    ks = key[order]
    grp_start = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
    seq = np.arange(len(ks), dtype=np.int64)
    seq -= np.repeat(grp_start, np.diff(np.r_[grp_start, len(ks)]))
    k = np.empty(len(ks), np.int64)
    k[order] = seq
    maxk = np.zeros(n_cells, np.int64)
    np.maximum.at(maxk, cell, k + 1)
    cpc = -(-maxk // cap)
    base = np.r_[0, np.cumsum(cpc)]
    chunk = base[cell] + k // cap
    row = k % cap
    return chunk, row, cpc


def _subslot(r_off, cell, nsub, sub_min):
    """Per-edge receiver-subwindow slot in [0, nsub]: slot ``sw < nsub``
    when that (cell, sw) queue holds >= sub_min edges (narrow scatter),
    else the residual slot ``nsub`` (full-span scatter)."""
    if nsub <= 1 or sub_min <= 0 or len(cell) == 0:
        return np.full(len(cell), nsub, np.int64)
    sw = r_off >> 10               # 1024 receivers = 8 groups per subwindow
    key = cell * nsub + sw
    cnt = np.bincount(key)
    return np.where(cnt[key] >= sub_min, sw, nsub)


def build_spmv2_plan(senders0: np.ndarray, receivers0: np.ndarray,
                     vals: np.ndarray, n: int, n_recv: int | None = None,
                     wr: int = 4096, hub: int = 2048,
                     windows=(160, 256, 1024, 2048),
                     cell_min: int = 4000, rows: int = 32,
                     sub_min: int = 0) -> Spmv2Plan:
    """Pack a 0-based COO edge list into the v2 chunked layout.

    ``rows=32`` ([32,128] chunks) amortizes per-chunk fixed cost and
    improves lane balance: 4.2 vs 6.3 ms/iter on RMAT-20 (vs rows=16).
    ``sub_min``: minimum (cell, receiver-subwindow) queue size for the
    narrow 8-group scatter; 0 disables splitting."""
    if n_recv is None:
        n_recv = n
    h = max(_round_up(_round_up(n, LANE) // LANE, LANE), LANE)
    n_send_pad = h * LANE
    n_pad = max(_round_up(n_recv, wr), wr)
    nb = n_pad // wr
    e = len(senders0)
    assert wr <= (1 << PK_BITS) - 1 + 1, "wr must fit the packed rcf field"
    nsub = wr // (GN * LANE) if wr >= 2 * GN * LANE else 1

    s = np.asarray(senders0, np.int64)
    r = np.asarray(receivers0, np.int64)
    v = np.asarray(vals, np.float32)
    hub = int(min(hub, 16 * LANE))   # hub table holds <= 16 x2 rows

    norm_windows = sorted({int(min(w, h)) for w in windows}) or [min(2048, h)]
    assert max(norm_windows) <= 2048, "window class must fit packed idx"
    from ..native import load_planner
    lib = load_planner()
    if lib is not None and e > 0:
        return _build_plan2_native(
            lib, s, r, v, e, h, wr, nb, hub, norm_windows, cell_min,
            n_pad, n_send_pad, receivers0, rows, sub_min)
    rblk = r // wr

    # chunk groups collected as (kind, blk[], base[], ngran[], chunk, row,
    # lane, idx_e, val_e, rc_e) then merged sorted by blk
    groups = []

    # ---------------- hub chunks (s < hub): static table ----------------
    hm = s < hub
    if hm.any():
        sh, rh, vh, bh = s[hm], r[hm], v[hm], rblk[hm]
        o = np.argsort(bh, kind="stable")
        sh, rh, vh, bh = sh[o], rh[o], vh[o], bh[o]
        top = sh < LANE
        lane = (sh & (LANE - 1)).astype(np.int64)
        ti = np.flatnonzero(top)
        if len(ti):
            # free lane choice for replicated top senders: round-robin
            tb = bh[ti]
            start = np.r_[0, np.flatnonzero(tb[1:] != tb[:-1]) + 1]
            seq = np.arange(len(ti), dtype=np.int64)
            seq -= np.repeat(start, np.diff(np.r_[start, len(ti)]))
            lane[ti] = seq % LANE
        # mid-hub 2-choice: each sender may also sit at lane^64 (gathering
        # from the rotated table granules); even split per (block, pair)
        # halves the worst lane load (chunks = ceil(max_lane / ROWS))
        rot = np.zeros(len(sh), bool)
        mi = np.flatnonzero(~top)
        if len(mi):
            pairkey = bh[mi] * 64 + (lane[mi] & 63)
            o2 = np.argsort(pairkey, kind="stable")
            pk = pairkey[o2]
            start = np.r_[0, np.flatnonzero(pk[1:] != pk[:-1]) + 1]
            seq = np.arange(len(mi), dtype=np.int64)
            seq -= np.repeat(start, np.diff(np.r_[start, len(mi)]))
            odd = np.zeros(len(mi), bool)
            odd[o2] = (seq & 1) == 1
            rot[mi] = odd
            lane[mi[odd]] ^= 64
        idx_e = np.where(top, sh,
                         LANE + (sh >> 7) + np.where(rot, 16, 0)
                         ).astype(np.int32)
        sub = _subslot(rh - bh * wr, bh, nsub, sub_min)
        ckey = bh * (nsub + 1) + sub
        uc, ci = np.unique(ckey, return_inverse=True)
        chunk, row, cpc = _pack_lanes(ci, lane, len(uc), rows)
        nc = int(cpc.sum())
        blk_c = np.repeat(uc // (nsub + 1), cpc)
        subv = uc % (nsub + 1)
        goff_c = np.repeat(np.where(subv == nsub, -1, subv * GN), cpc)
        groups.append((KIND_HUB, blk_c, np.zeros(nc, np.int64),
                       goff_c, chunk, row,
                       lane, idx_e, vh, (rh - bh * wr), nc))

    # ---------------- window chunks ----------------
    rem = ~hm
    windows = norm_windows
    for wi, W in enumerate(windows):
        if not rem.any():
            break
        assert W % 8 == 0
        last = wi == len(windows) - 1
        hi = s >> 7
        nwin = -(-h // W)
        win_id = hi // W
        cell = rblk * nwin + win_id
        if not last:
            cnt = np.bincount(cell[rem], minlength=nb * nwin)
            take = rem & (cnt[cell] >= cell_min)
        else:
            take = rem.copy()
        if not take.any():
            continue
        st, rt, vt, bt, ct = (s[take], r[take], v[take], rblk[take],
                              cell[take])
        o = np.argsort(ct, kind="stable")
        st, rt, vt, bt, ct = st[o], rt[o], vt[o], bt[o], ct[o]
        sub = _subslot(rt - bt * wr, ct, nsub, sub_min)
        ckey = ct * (nsub + 1) + sub
        uc2, ci = np.unique(ckey, return_inverse=True)
        lane = (st & (LANE - 1)).astype(np.int64)
        chunk, row, cpc = _pack_lanes(ci, lane, len(uc2), rows)
        nc = int(cpc.sum())
        uc = uc2 // (nsub + 1)
        subv = uc2 % (nsub + 1)
        cell_blk = uc // nwin
        # clamp the last window of the operand so base + W stays within h
        cell_base = np.minimum((uc % nwin) * W, h - W)
        blk_c = np.repeat(cell_blk, cpc)
        base_c = np.repeat(cell_base, cpc)
        goff_c = np.repeat(np.where(subv == nsub, -1, subv * GN), cpc)
        idx_e = (st >> 7) - cell_base[ci]
        groups.append((1 + wi, blk_c, base_c,
                       goff_c, chunk, row, lane,
                       idx_e.astype(np.int32), vt, (rt - bt * wr), nc))
        rem = rem & ~take

    # ---------------- merge groups, sorted by block ----------------
    total_nc = sum(g[10] for g in groups)
    covered = np.zeros(nb, bool)
    for g in groups:
        covered[g[1]] = True
    missing = np.flatnonzero(~covered)
    nc_all = total_nc + len(missing)

    kindid = np.zeros(nc_all, np.int32)
    blkid = np.zeros(nc_all, np.int32)
    baseid = np.zeros(nc_all, np.int32)
    goff = np.full(nc_all, -1, np.int32)
    idx = np.zeros((nc_all, rows, LANE), np.int32)
    val = np.zeros((nc_all, rows, LANE), np.float32)
    rcf = np.full((nc_all, rows, LANE), wr, np.int32)

    # global chunk order: by (block, group, local chunk)
    all_blk = np.concatenate(
        [g[1] for g in groups] + [missing]) if nc_all else np.zeros(0)
    all_grp = np.concatenate(
        [np.full(g[10], gi) for gi, g in enumerate(groups)]
        + [np.full(len(missing), len(groups))])
    all_loc = np.concatenate(
        [np.arange(g[10]) for g in groups] + [np.arange(len(missing))])
    order = np.lexsort((all_loc, all_grp, all_blk))
    rank = np.empty(nc_all, np.int64)
    rank[order] = np.arange(nc_all)

    off = 0
    for gi, g in enumerate(groups):
        (kind, blk_c, base_c, goff_c, chunk, row, lane, idx_e, val_e,
         rc_e, nc) = g
        gc = rank[off + chunk]                      # global chunk ids
        gmeta = rank[off:off + nc]
        kindid[gmeta] = kind
        blkid[gmeta] = blk_c
        baseid[gmeta] = base_c
        goff[gmeta] = goff_c
        idx[gc, row, lane] = idx_e
        val[gc, row, lane] = val_e
        rcf[gc, row, lane] = rc_e
        off += nc
    if len(missing):
        gmeta = rank[off:off + len(missing)]
        kindid[gmeta] = KIND_HUB
        blkid[gmeta] = missing

    assert (np.diff(blkid) >= 0).all()
    got = np.zeros(n_pad, bool)
    if e:
        got[np.unique(np.asarray(receivers0))] = True

    pk = (idx << PK_BITS) | rcf
    return _maybe_validate(Spmv2Plan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc_all,
        hub=hub, nnz=e, fill=e / max(nc_all * rows * LANE, 1),
        classes=tuple(windows), rows=rows,
        has_narrow=bool((goff >= 0).any()),
        kindid=jnp.asarray(kindid), blkid=jnp.asarray(blkid),
        base=jnp.asarray(baseid), goff=jnp.asarray(goff),
        pk=jnp.asarray(pk), val=jnp.asarray(val),
        got_static=jnp.asarray(got)))


def _build_plan2_native(lib, s, r, v, e, h, wr, nb, hub, windows,
                        cell_min, n_pad, n_send_pad, receivers0,
                        rows=ROWS, sub_min=2048):
    """C++/OpenMP v2 plan build (graphmat_tpu/native/planner.cpp)."""
    import ctypes

    sa = np.ascontiguousarray(s, np.int32)
    ra = np.ascontiguousarray(r, np.int32)
    va = np.ascontiguousarray(v, np.float32)
    wins = np.ascontiguousarray(windows, np.int32)
    nc_out = ctypes.c_int64()
    handle = lib.gm_plan2_create(sa, ra, va, e, h, wr, nb, hub, wins,
                                 len(wins), cell_min, rows, sub_min,
                                 ctypes.byref(nc_out))
    nc = int(nc_out.value)
    try:
        kindid = np.empty(nc, np.int32)
        blkid = np.empty(nc, np.int32)
        base = np.empty(nc, np.int32)
        goff = np.empty(nc, np.int32)
        pk = np.empty((nc, rows, LANE), np.int32)
        val = np.empty((nc, rows, LANE), np.float32)
        lib.gm_plan2_fill(handle, kindid, blkid, base, goff,
                          pk.reshape(-1), val.reshape(-1))
    finally:
        lib.gm_plan2_destroy(handle)

    got = np.zeros(n_pad, bool)
    got[np.unique(np.asarray(receivers0))] = True
    return _maybe_validate(Spmv2Plan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(int(w) for w in windows), rows=rows,
        has_narrow=bool((goff >= 0).any()),
        kindid=jnp.asarray(kindid), blkid=jnp.asarray(blkid),
        base=jnp.asarray(base), goff=jnp.asarray(goff),
        pk=jnp.asarray(pk), val=jnp.asarray(val),
        got_static=jnp.asarray(got)))


# ------------------------------------------------------------------ kernel

def _split_bf16(x, n_splits):
    """Exact bf16 decomposition: x == sum(parts) for n_splits >= 3."""
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


def _make_kernel(process: Callable, wr: int, h: int, n_splits: int,
                 classes, debug=None, x2_hbm=False, rows=ROWS,
                 sparse=False, has_narrow=False):
    G = wr // LANE
    wmax = max(classes)
    chunk = rows * LANE
    ntiles = rows // 8

    def kernel(kind_ref, blk_ref, base_ref, goff_ref, *rest):
        if sparse:
            act_ref = rest[0]
            rest = rest[2:]   # rest[1] = eff_ref, used by index maps only
        (pk_ref, val_ref, x2_ref, xtop_ref, xrot_ref, y_ref,
         acc_ref, wscr_ref, *dma_sem) = rest
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if x2_hbm:
            @pl.when(i == 0)
            def _():
                dma0 = pltpu.make_async_copy(
                    x2_ref.at[0:16, :], wscr_ref.at[wmax:wmax + 16, :],
                    dma_sem[0])
                dma0.start()
                dma0.wait()

        def compute():
            idxs = [pk_ref[0, 8 * t: 8 * t + 8, :] >> PK_BITS
                    for t in range(ntiles)]
            subs = [ix & 7 for ix in idxs]
            gsels = [ix >> 3 for ix in idxs]

            def gather_from(tbl_for_g, ngran):
                """Statically unrolled granule walk (the dynamic-trip loop
                variant measured ~86 ns/granule in loop+slice overhead
                alone)."""
                xvs = [jnp.zeros((8, LANE), jnp.float32)
                       for _ in range(ntiles)]
                for g in range(ngran):
                    tbl = tbl_for_g(g)
                    for t in range(ntiles):
                        got = jnp.take_along_axis(tbl, subs[t], axis=0)
                        xvs[t] = jnp.where(gsels[t] == g, got, xvs[t])
                return tuple(xvs)

            def hub_branch():
                def tbl(g):
                    if g < 16:
                        return xtop_ref[8 * g: 8 * g + 8, :]
                    if g < 18:
                        # x2[0:16] mirror is at the tail of wscr (HBM mode)
                        if x2_hbm:
                            return wscr_ref[wmax + 8 * (g - 16):
                                            wmax + 8 * (g - 16) + 8, :]
                        return x2_ref[8 * (g - 16): 8 * (g - 16) + 8, :]
                    return xrot_ref[8 * (g - 18): 8 * (g - 18) + 8, :]
                return gather_from(tbl, HUB_GRANULES)

            prev = jnp.maximum(i - 1, 0)
            same_win = jnp.logical_and(
                i > 0, jnp.logical_and(kind_ref[i] == kind_ref[prev],
                                       base_ref[i] == base_ref[prev]))
            # sparse mode: chunk activity is a function of (kind, base)
            # only, so same_win implies the previous chunk was active too
            # and did load the window — reuse stays safe under skipping.

            def window_branch(W):
                def inner():
                    base = pl.multiple_of(base_ref[i], 8)

                    @pl.when(jnp.logical_not(same_win))
                    def _():
                        if x2_hbm:
                            dma = pltpu.make_async_copy(
                                x2_ref.at[pl.ds(base, W), :],
                                wscr_ref.at[0:W, :], dma_sem[0])
                            dma.start()
                            dma.wait()
                        else:
                            wscr_ref[0:W, :] = x2_ref[pl.ds(base, W), :]
                    return gather_from(
                        lambda g: wscr_ref[8 * g: 8 * g + 8, :], W // 8)
                return inner

            if debug == "nogather":
                xvs = [jnp.full((8, LANE), 1.0, jnp.float32)
                       for _ in range(ntiles)]
            else:
                branches = [hub_branch] + [window_branch(W)
                                           for W in classes]
                xvs = list(jax.lax.switch(kind_ref[i], branches))

            ps = [process(xvs[t], val_ref[0, 8 * t: 8 * t + 8, :]).astype(
                jnp.float32) for t in range(ntiles)]
            p = jnp.concatenate(ps, axis=0)               # [rows, 128]
            if debug == "noscatter":
                acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(
                    p, axis=0, keepdims=True)
                y_ref[0] = acc_ref[:]
                return
            pf = p.reshape(1, chunk)                      # [1, rows*128]

            # ---- factored scatter: one MXU matmul ----
            rcf = pk_ref[0].reshape(1, chunk) & ((1 << PK_BITS) - 1)
            rcg = rcf >> 7
            rcl = rcf & (LANE - 1)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANE, chunk), 0)
            ohlo = (iota_l == rcl).astype(jnp.bfloat16)   # [128, 2048]
            parts = _split_bf16(pf, n_splits)

            def scatter_span(Gp, off):
                """[splits*Gp, chunk] x [128, chunk] scatter into a Gp-group
                window starting at group ``off`` (pads' rcg == G lands
                outside every window since off <= G - Gp)."""
                iota_g = jax.lax.broadcasted_iota(jnp.int32, (Gp, chunk), 0)
                gm = iota_g == (rcg - off)
                planes = [jnp.where(gm,
                                    jnp.broadcast_to(
                                        part.astype(jnp.float32), gm.shape),
                                    0.0)
                          for part in parts]
                P = jnp.concatenate(planes, axis=0).astype(jnp.bfloat16)
                M = jax.lax.dot_general(P, ohlo, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                contrib = M[0:Gp]
                for k in range(1, n_splits):
                    contrib = contrib + M[k * Gp:(k + 1) * Gp]
                return contrib                            # [Gp, 128]

            if has_narrow:
                goff = goff_ref[i]

                @pl.when(goff >= 0)
                def _():
                    off = pl.multiple_of(goff, GN)
                    acc_ref[pl.ds(off, GN), :] = (
                        acc_ref[pl.ds(off, GN), :] + scatter_span(GN, goff))

                @pl.when(goff < 0)
                def _():
                    acc_ref[:] = acc_ref[:] + scatter_span(G, 0)
            else:
                acc_ref[:] = acc_ref[:] + scatter_span(G, 0)

        if sparse:
            # frontier-driven chunk skip — the TPU analog of the
            # reference's sparse-frontier column skip
            # (singlenode/spmspv.h:48-60): inactive chunks contribute the
            # exact ⊕-identity and their plan blocks are never re-fetched
            # (the index map routes them to the previous active chunk's
            # block, which the pipeline treats as a revisit).
            @pl.when(act_ref[i] != 0)
            def _():
                compute()
        else:
            compute()

        # flush only on the block's last chunk (blkid is nondecreasing)
        npr = pl.num_programs(0)
        nxt = jnp.minimum(i + 1, npr - 1)
        last = jnp.logical_or(i == npr - 1, blk_ref[nxt] != blk_ref[i])

        @pl.when(last)
        def _():
            y_ref[0] = acc_ref[:]

    return kernel


def _chunk_activity(sent, kindid, base, classes, h, nc):
    """Per-chunk frontier activity + effective-block routing.

    ``sent``: bool[h*128] sender activity in X2 layout.  A chunk is active
    iff any sender in its gather range is — hub chunks read X2 rows
    [0, 16), window chunks [base, base + W).  Activity is thus a function
    of (kind, base) alone, which the kernel's window-reuse skip relies on.
    ``eff[i]`` = most recent active chunk id <= i (leading inactive chunks
    route to block 0): inactive chunks' plan blocks become pipeline
    revisits and are never fetched.
    """
    rowact = jnp.any(sent.reshape(h, LANE), axis=1).astype(jnp.int32)
    pref = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(rowact)])
    # rows gathered per kind: hub = 16 (hub <= 16*128 senders), else W
    wlen = jnp.asarray(np.array([16] + list(classes), np.int64),
                       dtype=jnp.int32)
    L = jnp.take(wlen, kindid)
    b = jnp.where(kindid == 0, 0, base)
    cact = (pref[jnp.minimum(b + L, h)] - pref[b]) > 0
    idxs = jnp.arange(nc, dtype=jnp.int32)
    eff = jax.lax.cummax(jnp.where(cact, idxs, -1))
    return cact.astype(jnp.int32), jnp.maximum(eff, 0)


@functools.partial(jax.jit, static_argnames=("plan_static", "process",
                                              "n_splits", "interpret",
                                              "debug", "x2_hbm"))
def _spmv2_call(plan_arrays, plan_static, x, process, n_splits, interpret,
                debug=None, x2_hbm=None, sent=None):
    h, wr, nb, nc, n_pad, classes = plan_static[:6]
    rows = plan_static[6] if len(plan_static) > 6 else ROWS
    has_narrow = plan_static[7] if len(plan_static) > 7 else False
    kindid, blkid, base, goff, pk, val = plan_arrays
    G = wr // LANE
    x2 = x.reshape(h, LANE)
    xtop = jnp.broadcast_to(x[:LANE, None], (LANE, LANE))
    xrot = jnp.roll(x2[:16], 64, axis=1)
    sparse = sent is not None
    if sparse:
        if sent.shape[0] < h * LANE:
            sent = jnp.pad(sent, (0, h * LANE - sent.shape[0]))
        act, eff = _chunk_activity(sent[: h * LANE], kindid, base,
                                   classes, h, nc)

    if x2_hbm is None:
        x2_hbm = h > VMEM_X2_MAX_ROWS and not interpret
    kernel = _make_kernel(process, wr, h, n_splits, classes, debug,
                          x2_hbm, rows, sparse, has_narrow)
    wmax = max(classes) if classes else 8
    if sparse:
        nmap = lambda i, kd, bk, bs, go, a, eff_: (eff_[i], 0, 0)
        omap = lambda i, kd, bk, bs, go, a, eff_: (bk[i], 0, 0)
    else:
        nmap = lambda i, *_: (i, 0, 0)
        omap = lambda i, kind, blk, bs, go: (blk[i], 0, 0)
    chunk_spec = pl.BlockSpec((1, rows, LANE), nmap,
                              memory_space=pltpu.VMEM)
    x2_spec = pl.BlockSpec(memory_space=(pltpu.ANY if x2_hbm
                                         else pltpu.VMEM))
    # HBM mode: wscr gains a 16-row mirror of x2[0:16] for hub granules
    scratch = [pltpu.VMEM((G, LANE), jnp.float32),
               pltpu.VMEM((wmax + (16 if x2_hbm else 0), LANE),
                          jnp.float32)]
    if x2_hbm:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if sparse else 4,
        grid=(nc,),
        in_specs=[chunk_spec, chunk_spec, x2_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, LANE), omap,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    operands = ((kindid, blkid, base, goff, act, eff) if sparse
                else (kindid, blkid, base, goff))
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        interpret=interpret,
    )(*operands, pk, val, x2, xtop, xrot)
    return out.reshape(nb * wr)[:n_pad]


def _identity_process(xv, ev):
    return xv


def _maybe_validate(plan, mm=False):
    from ..utils.debug import (debug_enabled, validate_plan2,
                               validate_plan2m)
    if debug_enabled():
        (validate_plan2m if mm else validate_plan2)(plan)
    return plan


def spmv2(plan: Spmv2Plan, x, reduce_kind: str = "sum",
          process: Optional[Callable] = None, interpret: bool = False,
          n_splits: int = 3, sent=None):
    """Generalized SpMV: ``y[r] = sum_{(s->r)} process(x[s], val)``.

    ``x``: f32[plan.n_send_pad] (shorter inputs are padded).  Returns
    f32[plan.n_pad].  v2 supports ⊕ = sum; the engine routes min/max to
    the v1 kernel.

    ``sent``: optional bool[n_send_pad] sender-activity mask enabling the
    sparse-frontier fast path — chunks whose gather range holds no active
    sender contribute exactly 0 and their plan blocks are never fetched.
    Inactive senders inside active chunks must already carry 0 in ``x``
    (the engine masks them), so skipping removes only exact zeros.
    """
    if reduce_kind != "sum":
        raise NotImplementedError("spmv2 supports sum only")
    if process is None:
        process = _identity_process
    if x.shape[0] < plan.n_send_pad:
        x = jnp.pad(x, (0, plan.n_send_pad - x.shape[0]))
    x = x[: plan.n_send_pad].astype(jnp.float32)
    plan_arrays = (plan.kindid, plan.blkid, plan.base, plan.goff,
                   plan.pk, plan.val)
    plan_static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
                   plan.classes, plan.rows, plan.has_narrow)
    return _spmv2_call(plan_arrays, plan_static, x, process, n_splits,
                       interpret, sent=sent)


# ------------------------------------------------------- min/max variant
#
# ⊕ = min/max cannot ride the scatter matmul, so the mm layout binds each
# slot's LANE to the receiver (rc & 127) and reduces per group on the VPU
# (masked min over sublanes — no bf16 splits, ±inf-safe, f32-exact).  The
# gather then needs one extra lane shuffle: senders register their window
# row in ``hi2`` at their own sender lane (per-row injective — a greedy
# bipartite edge coloring with 16 colors assigns rows), the granule walk
# builds q[i, l] = x[sender registered at lane l of row i], and
# ``take_along_axis(q, slo, axis=1)`` routes values to receiver slots.

@dataclass
class Spmv2mPlan:
    n_pad: int
    n_send_pad: int
    h: int
    wr: int
    nb: int
    nc: int
    hub: int
    nnz: int
    fill: float
    classes: tuple
    rows: int             # chunk sublanes (16 or 32)
    kindid: Any           # i32[nc]
    blkid: Any            # i32[nc]
    base: Any             # i32[nc]
    ngran: Any            # i32[nc]
    rowmask: Any          # i32[nc]  bit i: row i is single-receiver mode
    hi2: Any              # i32[nc,16,128] window row, registered by s-lane
    slo: Any              # i32[nc,16,128] per-slot sender lane
    val: Any              # f32[nc,16,128] per-slot edge value
    rcf: Any              # i32[nc,16,128] per-slot receiver offset; pad=wr
    got_static: Any


ROWMODE_MIN = 33   # in-cell receiver multiplicity that triggers row-mode


def _pack_rowmode(sl, free_lane):
    """Pack one hot receiver's edges into rows with distinct sender lanes:
    lane queues (row = per-lane cumcount); free-lane edges (replicated top
    senders) fill the least-loaded lanes.  Returns (row, slane, n_rows)."""
    ne = len(sl)
    row = np.zeros(ne, np.int64)
    slout = np.zeros(ne, np.int64)
    cnt = np.zeros(LANE, np.int64)
    bound = ~free_lane
    for k in np.flatnonzero(bound):
        l = sl[k]
        row[k] = cnt[l]
        slout[k] = l
        cnt[l] += 1
    for k in np.flatnonzero(free_lane):
        l = int(np.argmin(cnt))
        row[k] = cnt[l]
        slout[k] = l
        cnt[l] += 1
    return row, slout, int(cnt.max()) if ne else 0


def _pack_colored(rl, sl, free_lane, cap=ROWS):
    """Two-stage packing for one cell's edges: first assign chunks with
    per-(chunk, lane) capacity 16 on BOTH the receiver-lane and sender-lane
    sides, then color rows per chunk (greedy; edges a greedy 16-coloring
    cannot place overflow into appended chunks).

    ``rl``: receiver lane (slot lane).  ``sl``: sender lane; ``free_lane``
    marks replicated-top senders that may register at any lane.  Returns
    (chunk, row, chosen_slane, n_chunks).
    """
    ne = len(rl)
    chunk = np.zeros(ne, np.int64)
    row = np.zeros(ne, np.int64)
    slout = np.zeros(ne, np.int64)
    # stage 1: chunk assignment under two-sided lane capacity
    cnt_r = [np.zeros(LANE, np.int32)]
    cnt_s = [np.zeros(LANE, np.int32)]
    for k in range(ne):
        c = 0
        while True:
            if c == len(cnt_r):
                cnt_r.append(np.zeros(LANE, np.int32))
                cnt_s.append(np.zeros(LANE, np.int32))
            if cnt_r[c][rl[k]] < cap and (
                    free_lane[k] or cnt_s[c][sl[k]] < cap):
                break
            c += 1
        chunk[k] = c
        cnt_r[c][rl[k]] += 1
        if not free_lane[k]:
            cnt_s[c][sl[k]] += 1
    nch = len(cnt_r)
    # stage 2: per-chunk greedy row coloring; failures overflow
    pending = list(range(ne))
    slot_used = {}
    send_used = {}
    while pending:
        overflow = []
        for k in pending:
            c = chunk[k]
            if c not in slot_used:
                slot_used[c] = np.zeros((cap, LANE), bool)
                send_used[c] = np.zeros((cap, LANE), bool)
            su, se_ = slot_used[c], send_used[c]
            placed = False
            for i in range(cap):
                if su[i, rl[k]]:
                    continue
                if free_lane[k]:
                    fl = np.flatnonzero(~se_[i])
                    if len(fl) == 0:
                        continue
                    sx = fl[0]
                elif not se_[i, sl[k]]:
                    sx = sl[k]
                else:
                    continue
                su[i, rl[k]] = True
                se_[i, sx] = True
                row[k], slout[k] = i, sx
                placed = True
                break
            if not placed:
                overflow.append(k)
        if overflow:
            # push overflow edges into fresh chunks (rare: greedy needs
            # <= 2*cap-1 colors; two-sided cap keeps most chunks feasible)
            for k in overflow:
                chunk[k] = nch
            nch += 1
            pending = overflow
        else:
            pending = []
    return chunk, row, slout, nch


def build_spmv2m_plan(senders0: np.ndarray, receivers0: np.ndarray,
                      vals: np.ndarray, n: int, n_recv: int | None = None,
                      wr: int = 4096, hub: int = 2048,
                      windows=(64, 256, 1024, 2048),
                      cell_min: int = 4000,
                      rows: int = 32) -> Spmv2mPlan:
    """min/max-layout plan (receiver-lane-bound slots, colored rows)."""
    if n_recv is None:
        n_recv = n
    h = max(_round_up(_round_up(n, LANE) // LANE, LANE), LANE)
    n_send_pad = h * LANE
    n_pad = max(_round_up(n_recv, wr), wr)
    nb = n_pad // wr
    e = len(senders0)
    s = np.asarray(senders0, np.int64)
    r = np.asarray(receivers0, np.int64)
    v = np.asarray(vals, np.float32)
    hub = int(min(hub, 16 * LANE))
    norm_windows = sorted({int(min(w, h)) for w in windows}) or [min(2048, h)]

    from ..native import load_planner
    lib = load_planner()
    if lib is not None and e > 0 and hasattr(lib, "gm_plan2m_create"):
        return _build_plan2m_native(
            lib, s, r, v, e, h, wr, nb, hub, norm_windows, cell_min,
            n_pad, n_send_pad, receivers0, rows)

    rblk = r // wr
    # classification identical to the sum plan
    kind = np.full(e, -1, np.int64)
    cellw = np.zeros(e, np.int64)
    basew = np.zeros(e, np.int64)
    hm = s < hub
    kind[hm] = 0
    cellw[hm] = rblk[hm]
    rem = ~hm
    for wi, W in enumerate(norm_windows):
        if not rem.any():
            break
        last = wi == len(norm_windows) - 1
        nwin = -(-h // W)
        cell = rblk * nwin + (s >> 7) // W
        if not last:
            cnt = np.bincount(cell[rem], minlength=nb * nwin)
            take = rem & (cnt[cell] >= cell_min)
        else:
            take = rem.copy()
        kind[take] = 1 + wi
        cellw[take] = cell[take]
        basew[take] = np.minimum(((s[take] >> 7) // W) * W, h - W)
        rem = rem & ~take

    # pack per (kind, cell) in (blk, kind, cell) order
    chunks = []   # (kindid, blk, base, ngran, hi2, slo, val, rcf) per chunk
    order = np.lexsort((cellw, kind, rblk))
    ks, cs, bs = kind[order], cellw[order], rblk[order]
    bounds = (np.r_[0, np.flatnonzero((ks[1:] != ks[:-1])
                                      | (cs[1:] != cs[:-1])) + 1, e]
              if e else np.zeros(1, np.int64))
    for gi in range(len(bounds) - 1):
        lo, hi_ = bounds[gi], bounds[gi + 1]
        idxs = order[lo:hi_]
        kd = int(ks[lo])
        blk = int(bs[lo])
        se, re_, ve = s[idxs], r[idxs], v[idxs]
        rl = (re_ & (LANE - 1)).astype(np.int64)
        if kd == 0:
            top = se < LANE
            sl = (se & (LANE - 1)).astype(np.int64)
            free = top
            base = 0
            ng = HUB_GRANULES
        else:
            sl = (se & (LANE - 1)).astype(np.int64)
            free = np.zeros(len(se), bool)
            base = int(basew[idxs[0]])
            ng = norm_windows[kd - 1] // 8
        def gidx_of(sv):
            if kd == 0:
                return np.where(sv < LANE, sv,
                                LANE + (sv >> 7)).astype(np.int32)
            return (sv >> 7).astype(np.int32) - base

        # hot receivers (in-cell multiplicity >= ROWMODE_MIN) take whole
        # rows: any lanes, distinct sender lanes; the kernel row-reduces
        # and routes the single result to the receiver's lane.  Without
        # this, an in-degree hub pins its lane at <=16 edges per chunk.
        ur, rcount = np.unique(re_, return_counts=True)
        hotset = set(ur[rcount >= ROWMODE_MIN].tolist())
        ishot = np.array([x in hotset for x in re_]) if hotset else             np.zeros(len(re_), bool)

        RW = rows
        rm_rows = []   # (receiver, hi2row, slorow, valrow, maskrow)
        if ishot.any():
            for rv in sorted(hotset):
                m = re_ == rv
                slh, freeh, seh, veh = sl[m], free[m], se[m], ve[m]
                rwh, sxh, nrh = _pack_rowmode(slh, freeh)
                for rr in range(nrh):
                    mm_ = rwh == rr
                    h2 = np.zeros(LANE, np.int32)
                    sr = np.zeros(LANE, np.int32)
                    vr = np.zeros(LANE, np.float32)
                    rcr = np.full(LANE, wr, np.int32)
                    h2[sxh[mm_]] = gidx_of(seh[mm_])
                    sr[sxh[mm_]] = sxh[mm_]
                    vr[sxh[mm_]] = veh[mm_]
                    rcr[sxh[mm_]] = rv - blk * wr
                    rm_rows.append((h2, sr, vr, rcr))
        # row-mode rows fill whole chunks (rowmask bits set per used row)
        for c0 in range(0, len(rm_rows), RW):
            grp = rm_rows[c0:c0 + RW]
            hi2 = np.zeros((RW, LANE), np.int32)
            slo = np.zeros((RW, LANE), np.int32)
            vv = np.zeros((RW, LANE), np.float32)
            rcq = np.full((RW, LANE), wr, np.int32)
            for i, (h2, sr, vr, rcr) in enumerate(grp):
                hi2[i], slo[i], vv[i], rcq[i] = h2, sr, vr, rcr
            rowmask = -1 if len(grp) >= 32 else (1 << len(grp)) - 1
            chunks.append((kd, blk, base, ng, hi2, slo, vv, rcq, rowmask))

        cold = ~ishot
        if cold.any():
            rlc, slc, freec = rl[cold], sl[cold], free[cold]
            sec, vec, rec = se[cold], ve[cold], re_[cold]
            ch, rw, sx, ncc = _pack_colored(rlc, slc, freec, rows)
            for c in range(ncc):
                m = ch == c
                hi2 = np.zeros((rows, LANE), np.int32)
                slo = np.zeros((rows, LANE), np.int32)
                vv = np.zeros((rows, LANE), np.float32)
                rcq = np.full((rows, LANE), wr, np.int32)
                ri, sxi, rli = rw[m], sx[m], rlc[m]
                gi2 = gidx_of(sec[m])
                hi2[ri, sxi] = gi2
                slo[ri, rli] = sxi
                vv[ri, rli] = vec[m]
                rcq[ri, rli] = (rec[m] - blk * wr).astype(np.int32)
                chunks.append((kd, blk, base, ng, hi2, slo, vv, rcq, 0))

    covered = {c[1] for c in chunks}
    for b in range(nb):
        if b not in covered:
            chunks.append((0, b, 0, HUB_GRANULES,
                           np.zeros((rows, LANE), np.int32),
                           np.zeros((rows, LANE), np.int32),
                           np.zeros((rows, LANE), np.float32),
                           np.full((rows, LANE), wr, np.int32), 0))
    chunks.sort(key=lambda c: c[1])
    nc = len(chunks)
    got = np.zeros(n_pad, bool)
    if e:
        got[np.unique(np.asarray(receivers0))] = True
    return _maybe_validate(Spmv2mPlan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(norm_windows), rows=rows,
        kindid=jnp.asarray(np.array([c[0] for c in chunks], np.int32)),
        blkid=jnp.asarray(np.array([c[1] for c in chunks], np.int32)),
        base=jnp.asarray(np.array([c[2] for c in chunks], np.int32)),
        ngran=jnp.asarray(np.array([c[3] for c in chunks], np.int32)),
        rowmask=jnp.asarray(np.array([c[8] for c in chunks], np.int32)),
        hi2=jnp.asarray(np.stack([c[4] for c in chunks])),
        slo=jnp.asarray(np.stack([c[5] for c in chunks])),
        val=jnp.asarray(np.stack([c[6] for c in chunks])),
        rcf=jnp.asarray(np.stack([c[7] for c in chunks])),
        got_static=jnp.asarray(got)), mm=True)


def _build_plan2m_native(lib, s, r, v, e, h, wr, nb, hub, windows,
                         cell_min, n_pad, n_send_pad, receivers0,
                         rows=32):
    """C++/OpenMP v2m plan build (graphmat_tpu/native/planner.cpp)."""
    import ctypes

    sa = np.ascontiguousarray(s, np.int32)
    ra = np.ascontiguousarray(r, np.int32)
    va = np.ascontiguousarray(v, np.float32)
    wins = np.ascontiguousarray(windows, np.int32)
    nc_out = ctypes.c_int64()
    handle = lib.gm_plan2m_create(sa, ra, va, e, h, wr, nb, hub, wins,
                                  len(wins), cell_min, rows,
                                  ctypes.byref(nc_out))
    nc = int(nc_out.value)
    try:
        kindid = np.empty(nc, np.int32)
        blkid = np.empty(nc, np.int32)
        base = np.empty(nc, np.int32)
        ngran = np.empty(nc, np.int32)
        rowmask = np.empty(nc, np.int32)
        hi2 = np.empty((nc, rows, LANE), np.int32)
        slo = np.empty((nc, rows, LANE), np.int32)
        val = np.empty((nc, rows, LANE), np.float32)
        rcf = np.empty((nc, rows, LANE), np.int32)
        lib.gm_plan2m_fill(handle, kindid, blkid, base, ngran, rowmask,
                           hi2.reshape(-1), slo.reshape(-1),
                           val.reshape(-1), rcf.reshape(-1))
    finally:
        lib.gm_plan2m_destroy(handle)
    got = np.zeros(n_pad, bool)
    got[np.unique(np.asarray(receivers0))] = True
    return _maybe_validate(Spmv2mPlan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(int(w) for w in windows), rows=rows,
        kindid=jnp.asarray(kindid), blkid=jnp.asarray(blkid),
        base=jnp.asarray(base), ngran=jnp.asarray(ngran),
        rowmask=jnp.asarray(rowmask),
        hi2=jnp.asarray(hi2), slo=jnp.asarray(slo), val=jnp.asarray(val),
        rcf=jnp.asarray(rcf), got_static=jnp.asarray(got)), mm=True)


def _make_kernel_mm(reduce_kind: str, process: Callable, wr: int, h: int,
                    classes, x2_hbm=False, rows=ROWS, sparse=False):
    G = wr // LANE
    wmax = max(classes)
    ntiles = rows // 8
    ident = np.float32(np.inf if reduce_kind == "min" else -np.inf)
    comb = jnp.minimum if reduce_kind == "min" else jnp.maximum

    def kernel(kind_ref, blk_ref, base_ref, rowmask_ref, *rest):
        if sparse:
            act_ref = rest[0]
            rest = rest[2:]   # rest[1] = eff_ref, used by index maps only
        (hi2_ref, slo_ref, val_ref, rcf_ref, x2_ref, xtop_ref, xrot_ref,
         y_ref, acc_ref, wscr_ref, *dma_sem) = rest
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.full_like(acc_ref, ident)

        if x2_hbm:
            @pl.when(i == 0)
            def _():
                dma0 = pltpu.make_async_copy(
                    x2_ref.at[0:16, :], wscr_ref.at[wmax:wmax + 16, :],
                    dma_sem[0])
                dma0.start()
                dma0.wait()

        def compute():
            subs = [hi2_ref[0, 8 * t: 8 * t + 8, :] & 7
                    for t in range(ntiles)]
            gsels = [hi2_ref[0, 8 * t: 8 * t + 8, :] >> 3
                     for t in range(ntiles)]

            def gather_from(tbl_for_g, ngran):
                qs = [jnp.zeros((8, LANE), jnp.float32)
                      for _ in range(ntiles)]
                for g in range(ngran):
                    tbl = tbl_for_g(g)
                    for t in range(ntiles):
                        got = jnp.take_along_axis(tbl, subs[t], axis=0)
                        qs[t] = jnp.where(gsels[t] == g, got, qs[t])
                return tuple(qs)

            def hub_branch():
                def tbl(g):
                    if g < 16:
                        return xtop_ref[8 * g: 8 * g + 8, :]
                    if g < 18:
                        if x2_hbm:
                            return wscr_ref[wmax + 8 * (g - 16):
                                            wmax + 8 * (g - 16) + 8, :]
                        return x2_ref[8 * (g - 16): 8 * (g - 16) + 8, :]
                    return xrot_ref[8 * (g - 18): 8 * (g - 18) + 8, :]
                return gather_from(tbl, HUB_GRANULES)

            prev = jnp.maximum(i - 1, 0)
            same_win = jnp.logical_and(
                i > 0, jnp.logical_and(kind_ref[i] == kind_ref[prev],
                                       base_ref[i] == base_ref[prev]))
            # sparse mode: activity is (kind, base)-determined, so a
            # same_win predecessor was active and loaded the window.

            def window_branch(W):
                def inner():
                    base = pl.multiple_of(base_ref[i], 8)

                    @pl.when(jnp.logical_not(same_win))
                    def _():
                        if x2_hbm:
                            dma = pltpu.make_async_copy(
                                x2_ref.at[pl.ds(base, W), :],
                                wscr_ref.at[0:W, :], dma_sem[0])
                            dma.start()
                            dma.wait()
                        else:
                            wscr_ref[0:W, :] = x2_ref[pl.ds(base, W), :]
                    return gather_from(
                        lambda g: wscr_ref[8 * g: 8 * g + 8, :], W // 8)
                return inner

            branches = [hub_branch] + [window_branch(W) for W in classes]
            qs = list(jax.lax.switch(kind_ref[i], branches))

            # route to receiver-lane slots, then process
            ps = []
            for t in range(ntiles):
                xv = jnp.take_along_axis(
                    qs[t], slo_ref[0, 8 * t: 8 * t + 8, :], axis=1)
                ps.append(process(
                    xv, val_ref[0, 8 * t: 8 * t + 8, :]).astype(
                        jnp.float32))
            p = jnp.concatenate(ps, axis=0)                # [rows,128]
            rcf = rcf_ref[0]                               # pads = wr

            # single-receiver rows (in-degree hubs): reduce the whole row
            # and route the one result to the receiver's lane before the
            # group reduce.  rc_row = min(rcf) is the row's receiver.
            red_ax1 = jnp.min if reduce_kind == "min" else jnp.max
            rm = rowmask_ref[i]
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            mode = ((rm >> jnp.minimum(iota_r, 31)) & 1) == 1   # [rows,1]
            rc_row = jnp.min(rcf, axis=1, keepdims=True)   # [rows,1]
            pmask = jnp.where(rcf == rc_row, p, ident)
            rowred = red_ax1(pmask, axis=1, keepdims=True)  # [rows,1]
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
            hit = lane_i == (rc_row & (LANE - 1))
            p_rm = jnp.where(hit, jnp.broadcast_to(rowred, (rows, LANE)),
                             ident)
            rcf_rm = jnp.where(hit, jnp.broadcast_to(rc_row, (rows, LANE)),
                               wr)
            p = jnp.where(mode, p_rm, p)
            rg = jnp.where(mode, rcf_rm, rcf) >> 7

            for g in range(G):
                pm = jnp.where(rg == g, p, ident)
                red = (jnp.min if reduce_kind == "min" else jnp.max)(
                    pm, axis=0, keepdims=True)             # [1,128]
                acc_ref[g:g + 1, :] = comb(acc_ref[g:g + 1, :], red)

        if sparse:
            # frontier-driven chunk skip (see _make_kernel): inactive
            # chunks contribute ident and their blocks are never fetched.
            @pl.when(act_ref[i] != 0)
            def _():
                compute()
        else:
            compute()

        # flush only on the block's last chunk (blkid is nondecreasing)
        npr = pl.num_programs(0)
        nxt = jnp.minimum(i + 1, npr - 1)
        last = jnp.logical_or(i == npr - 1, blk_ref[nxt] != blk_ref[i])

        @pl.when(last)
        def _():
            y_ref[0] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("plan_static", "reduce_kind",
                                              "process", "interpret",
                                              "x2_hbm"))
def _spmv2m_call(plan_arrays, plan_static, x, reduce_kind, process,
                 interpret, x2_hbm=None, sent=None):
    h, wr, nb, nc, n_pad, classes = plan_static[:6]
    rows = plan_static[6] if len(plan_static) > 6 else ROWS
    kindid, blkid, base, ngran, rowmask, hi2, slo, val, rcf = plan_arrays
    del ngran
    G = wr // LANE
    x2 = x.reshape(h, LANE)
    xtop = jnp.broadcast_to(x[:LANE, None], (LANE, LANE))
    xrot = jnp.roll(x2[:16], 64, axis=1)
    sparse = sent is not None
    if sparse:
        if sent.shape[0] < h * LANE:
            sent = jnp.pad(sent, (0, h * LANE - sent.shape[0]))
        act, eff = _chunk_activity(sent[: h * LANE], kindid, base,
                                   classes, h, nc)

    if x2_hbm is None:
        x2_hbm = h > VMEM_X2_MAX_ROWS and not interpret
    kernel = _make_kernel_mm(reduce_kind, process, wr, h, classes, x2_hbm,
                             rows, sparse)
    wmax = max(classes) if classes else 8
    if sparse:
        nmap = lambda i, kd, bk, bs, rmk, a, eff_: (eff_[i], 0, 0)
        omap = lambda i, kd, bk, bs, rmk, a, eff_: (bk[i], 0, 0)
    else:
        nmap = lambda i, *_: (i, 0, 0)
        omap = lambda i, kind, blk, bs, rmk: (blk[i], 0, 0)
    chunk_spec = pl.BlockSpec((1, rows, LANE), nmap,
                              memory_space=pltpu.VMEM)
    x2_spec = pl.BlockSpec(memory_space=(pltpu.ANY if x2_hbm
                                         else pltpu.VMEM))
    scratch = [pltpu.VMEM((G, LANE), jnp.float32),
               pltpu.VMEM((wmax + (16 if x2_hbm else 0), LANE),
                          jnp.float32)]
    if x2_hbm:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if sparse else 4,
        grid=(nc,),
        in_specs=[chunk_spec] * 4
        + [x2_spec,
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, LANE), omap,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    operands = ((kindid, blkid, base, rowmask, act, eff) if sparse
                else (kindid, blkid, base, rowmask))
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        interpret=interpret,
    )(*operands, hi2, slo, val, rcf, x2, xtop, xrot)
    return out.reshape(nb * wr)[:n_pad]


def spmv2m(plan: Spmv2mPlan, x, reduce_kind: str,
           process: Optional[Callable] = None, interpret: bool = False,
           sent=None):
    """Generalized SpMV with ⊕ = min/max on the mm (colored) layout.

    ``sent``: optional bool[n_send_pad] sender-activity mask; when given,
    chunks whose gather range holds no active sender are skipped outright
    (they contribute the ⊕-identity ±inf) — the sparse-frontier fast path.
    Inactive senders inside active chunks must already carry the
    ±PALLAS_BIG fill in ``x`` (the engine does this).
    """
    assert reduce_kind in ("min", "max")
    if process is None:
        process = _identity_process
    if x.shape[0] < plan.n_send_pad:
        x = jnp.pad(x, (0, plan.n_send_pad - x.shape[0]))
    x = x[: plan.n_send_pad].astype(jnp.float32)
    plan_arrays = (plan.kindid, plan.blkid, plan.base, plan.ngran,
                   plan.rowmask, plan.hi2, plan.slo, plan.val, plan.rcf)
    plan_static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
                   plan.classes, plan.rows)
    return _spmv2m_call(plan_arrays, plan_static, x, reduce_kind, process,
                        interpret, sent=sent)
