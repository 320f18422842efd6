"""Pallas TPU generalized-SpMV v2 — VPU-gather / MXU-scatter kernel.

Replaces the v1 one-hot-matmul gather (``pallas_spmv.py``), whose cost was
``window x n_splits*128`` MACs *per edge* — the measured wall at RMAT-20
scale.  v2 re-expresses the gather as a *cross-sublane dynamic gather*
(``take_along_axis`` over 8-row granules of the lane-tiled operand
``X2[h, l] = x[h*128 + l]``, an exact-f32 VPU op) and moves all remaining
MXU work into one factored scatter matmul per chunk.

Plan layout (host-built, once per graph; the "v2r" routed revision):

* Edges are grouped by (receiver block of width ``wr``, sender-window
  cell) and packed into ``[rows, 128]`` chunks of ``rows*128`` slots.
  Within each chunk row a sender *registers* its gather index at its own
  lane (``s & 127``) — at most one sender per (row, lane) — and each edge
  slot carries ``slo``, the lane its sender registered at.  The kernel
  gathers ``q[i, l] = window[hi2[i, l], l]`` (cross-sublane
  ``take_along_axis``, the reference's COOSIMD32 conflict-free binning
  ``COOSIMD32Tile.h:235-318`` transposed onto vector lanes) and routes
  ``xv[i, l'] = q[i, slo[i, l']]`` with one more ``take_along_axis``.
  Routing frees the slot lane entirely: chunks pack to near-perfect fill
  regardless of sender-lane skew (the earlier lane-bound layout lost 24%
  of its slots to lane imbalance on RMAT-20), at the cost of one extra
  VPU gather per 8-row tile.

* **Hub chunks**: senders below ``hub`` (<= 2048, i.e. 16 X2 rows) gather
  straight from the head of X2 — 2 granules instead of the lane-bound
  layout's 20-granule replicated-table walk.

* **Window chunks**: remaining edges get the smallest aligned sender
  window (class sizes ``windows``, in 128-sender X2 rows) whose
  (block, window) cell holds enough edges to fill chunks; sparse cells
  escalate to coarser classes.  The kernel copies the window into VMEM
  scratch once per cell (``same_win`` revisit skip) and walks its 8-row
  granules statically.

* **Scatter (⊕ = sum)**: per chunk, products are reshaped to
  ``[1, rows*128]``, split exactly into ``n_splits`` bf16 planes, masked
  into ``wr/128`` receiver groups, and contracted against a 128-wide lane
  one-hot in a single ``[splits*G, rows*128] x [128, rows*128]`` MXU
  matmul.  Padded slots carry receiver sentinel ``wr``, which matches no
  group — no mask stream.  (A "narrow scatter" that shrank G per chunk
  was measured unprofitable: M <= 128 already fits one MXU output tile —
  see PERF.md.)

* Registration, routing and receiver offset ride ONE packed int32 plane:
  ``pk = hi2 << 21 | slo << 14 | rcf`` (hi2 < 2048, slo < 128,
  rcf <= wr <= 16383) — 8 bytes of plan stream per slot with ``val``.

Chunks of one receiver block are consecutive in the grid, so the block's
``[G, 128]`` accumulator lives in VMEM scratch across chunks, mirroring the
reference's 32-row-aligned private partitions (``DCSCTile.h:247-249``).

min/max semirings and the K-wide vector path still run on their own
layouts below; the engine picks per semiring.
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
HUB_GRANULES = 20         # mm/v1 layouts: 16 xtop + 2 x2 + 2 rotated
HUB_GRANULES2 = 2         # v2r sum layout: x2 rows [0, 16) directly
VMEM_X2_MAX_ROWS = 16384  # beyond this the operand stays in HBM (8 MB f32)
                          # and windows are DMA'd per chunk
KIND_HUB = 0
KIND_WINDOW = 1
RCF_BITS = 14             # pk bits [0, 14) = receiver offset in block
SLO_BITS = 7              # pk bits [14, 21) = routing lane
                          # pk bits [21, 32) = registered gather row


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
    kindid: Any           # i32[nc]  0 = hub, 1+k = window class k
    blkid: Any            # i32[nc]  receiver block (nondecreasing)
    base: Any             # i32[nc]  X2 window base row (8-aligned)
    kind2: Any            # i32[nc]  second-half window class
    base2: Any            # i32[nc]  second-half window base
    pk: Any               # i32[nc,rows,128] hi2<<21 | slo<<14 | rcf
    val: Any              # f32[nc,rows,128] edge values (pads 0)
    got_static: Any       # bool[n_pad]
    eidx: Any = None      # host i32[nc,rows,128]: slot -> original edge
                          # index (-1 pads) — enables val-only refresh


def _classify(s, r, rblk, h, nb, wr, hub, windows, cell_min):
    """Shared edge classification: (kind, cell key, window base, gather
    row) per edge.  Cell keys are globally unique and sort by
    (kind, block, window).  ``cell_min`` may be a per-window sequence
    (the v2u flat-degree acceptance rule) or a scalar."""
    if not np.isscalar(cell_min):
        cms = list(cell_min)
    else:
        cms = [cell_min] * len(windows)
    e = len(s)
    kind = np.full(e, -1, np.int64)
    cellk = np.zeros(e, np.int64)
    basew = np.zeros(e, np.int64)
    hm = s < hub
    kind[hm] = 0
    cellk[hm] = rblk[hm]
    rem = ~hm
    cell_ofs = nb
    for wi, W in enumerate(windows):
        if not rem.any():
            break
        last = wi == len(windows) - 1
        nwin = -(-h // W)
        cl = rblk * nwin + (s >> 7) // W
        if not last:
            cnt = np.bincount(cl[rem], minlength=nb * nwin)
            take = rem & (cnt[cl] >= cms[wi])
        else:
            take = rem.copy()
        kind[take] = 1 + wi
        basew[take] = np.minimum(((s[take] >> 7) // W) * W, h - W)
        cellk[take] = cell_ofs + cl[take]
        cell_ofs += nb * nwin
        rem &= ~take
    gidx = np.where(kind == 0, s >> 7, (s >> 7) - basew)
    return kind, cellk, basew, gidx


def _pack_routed_cell(sv, rv, vv, gv, blk, wr, rows_cap, iv=None):
    """Routed row packing for one cell's edges (must be sender-sorted).

    Rows hold up to 128 slots; each row registers at most one sender per
    sender lane.  Greedy: senders in descending degree, per-lane candidate
    row stacks.  Returns (rows list of (hi2, slo, rcf, val, idx)
    int32/float32 [128] arrays); ``iv`` carries original edge indices for
    the val-refresh map (idx rows are -1 where no slot)."""
    lanes = (sv & (LANE - 1)).astype(np.int64)
    bnd = np.r_[0, np.flatnonzero(sv[1:] != sv[:-1]) + 1, len(sv)]
    sizes = np.diff(bnd)
    sorder = np.argsort(-sizes, kind="stable")
    reg = []
    nslots = []
    cand = [[] for _ in range(LANE)]
    hi2_rows, slo_rows, rcf_rows, val_rows, idx_rows = [], [], [], [], []
    for gI in sorder:
        lo, hi_ = int(bnd[gI]), int(bnd[gI + 1])
        L = int(lanes[lo])
        gx = int(gv[lo])
        ptr = lo
        while ptr < hi_:
            row = -1
            st = cand[L]
            while st:
                cr = st[-1]
                if nslots[cr] >= LANE or reg[cr][L]:
                    st.pop()
                    continue
                row = cr
                break
            if row < 0:
                row = len(reg)
                reg.append(np.zeros(LANE, bool))
                nslots.append(0)
                hi2_rows.append(np.zeros(LANE, np.int32))
                slo_rows.append(np.zeros(LANE, np.int32))
                rcf_rows.append(np.full(LANE, wr, np.int32))
                val_rows.append(np.zeros(LANE, np.float32))
                idx_rows.append(np.full(LANE, -1, np.int32))
                for l2 in range(LANE):
                    cand[l2].append(row)
            reg[row][L] = True
            hi2_rows[row][L] = gx
            take = min(hi_ - ptr, LANE - nslots[row])
            sl = nslots[row]
            slo_rows[row][sl:sl + take] = L
            rcf_rows[row][sl:sl + take] = rv[ptr:ptr + take] - blk * wr
            val_rows[row][sl:sl + take] = vv[ptr:ptr + take]
            if iv is not None:
                idx_rows[row][sl:sl + take] = iv[ptr:ptr + take]
            nslots[row] += take
            ptr += take
    return hi2_rows, slo_rows, rcf_rows, val_rows, idx_rows


def build_spmv2_plan(senders0: np.ndarray, receivers0: np.ndarray,
                     vals: np.ndarray, n: int, n_recv: int | None = None,
                     wr: int = 4096, hub: int = 2048,
                     windows=(160, 256, 1024, 2048),
                     cell_min: int = 4000, rows: int = 64) -> Spmv2Plan:
    """Pack a 0-based COO edge list into the v2r routed chunk layout.

    ``rows=64`` ([64,128] chunks, two 32-row window halves) amortizes
    per-chunk fixed cost: 4.15 vs 4.42 ms/iter on RMAT-20 (vs rows=32;
    rows=128 regresses on fill)."""
    if n_recv is None:
        n_recv = n
    h = max(_round_up(_round_up(n, LANE) // LANE, LANE), LANE)
    n_send_pad = h * LANE
    n_pad = max(_round_up(n_recv, wr), wr)
    nb = n_pad // wr
    e = len(senders0)
    assert wr <= (1 << RCF_BITS) - 1, "wr must fit the packed rcf field"
    assert rows % 16 == 0, "rows must split into two 8-aligned halves"

    s = np.asarray(senders0, np.int64)
    r = np.asarray(receivers0, np.int64)
    v = np.asarray(vals, np.float32)
    hub = int(min(hub, 16 * LANE))   # hub gather covers x2 rows [0, 16)

    norm_windows = sorted({int(min(w, h)) for w in windows}) or [min(2048, h)]
    assert max(norm_windows) <= 2048, "window class must fit packed hi2"
    from ..native import load_planner
    lib = load_planner()
    if lib is not None and e > 0:
        return _build_plan2_native(
            lib, s, r, v, e, h, wr, nb, hub, norm_windows, cell_min,
            n_pad, n_send_pad, receivers0, rows)

    rblk = r // wr
    kind, cellk, basew, gidx = _classify(s, r, rblk, h, nb, wr, hub,
                                         norm_windows, cell_min)
    # cells in (block, kind, window) order; edges sender-sorted per cell
    order = np.lexsort((s, cellk, kind, rblk))
    so, ro, vo, go = s[order], r[order], v[order], gidx[order]
    ko, co, bo, blko = kind[order], cellk[order], basew[order], rblk[order]
    io = order.astype(np.int32)
    half = rows // 2

    # routed packing per cell -> (blk, kind, base, [row (pk, val, idx)])
    cells_rows = []
    cb = np.r_[0, np.flatnonzero(co[1:] != co[:-1]) + 1, e] if e \
        else np.zeros(1, np.int64)
    for gi in range(len(cb) - 1):
        lo, hi_ = int(cb[gi]), int(cb[gi + 1])
        blk = int(blko[lo])
        hi2_r, slo_r, rcf_r, val_r, idx_r = _pack_routed_cell(
            so[lo:hi_], ro[lo:hi_], vo[lo:hi_], go[lo:hi_], blk, wr, rows,
            iv=io[lo:hi_])
        rws = [(((h2.astype(np.uint32) << 21)
                 | (sl.astype(np.uint32) << RCF_BITS)
                 | rc.astype(np.uint32)).view(np.int32), vl, ix)
               for h2, sl, rc, vl, ix in zip(hi2_r, slo_r, rcf_r, val_r,
                                             idx_r)]
        cells_rows.append((blk, int(ko[lo]), int(bo[lo]), rws))

    # half-chunk assembly: each chunk is two rows//2-row halves with
    # independent gather windows, so cell tails pair across cells of the
    # same block instead of wasting a whole chunk each
    kind_c, blk_c, base_c, kind2_c, base2_c = [], [], [], [], []
    chunks_pk, chunks_val, chunks_idx = [], [], []
    ci = 0
    for b in range(nb):
        halves = []          # (kind, base, row list of <= half rows)
        while ci < len(cells_rows) and cells_rows[ci][0] == b:
            _, kd, bs, rws = cells_rows[ci]
            for off in range(0, max(len(rws), 1), half):
                halves.append((kd, bs, rws[off:off + half]))
            ci += 1
        if not halves:
            halves.append((KIND_HUB, 0, []))   # empty-block coverage
        if len(halves) & 1:                    # pad half: mirror previous
            halves.append((halves[-1][0], halves[-1][1], []))
        for c in range(len(halves) // 2):
            kA, bA, rA = halves[2 * c]
            kB, bB, rB = halves[2 * c + 1]
            pkc = np.full((rows, LANE), wr, np.int32)
            vlc = np.zeros((rows, LANE), np.float32)
            ixc = np.full((rows, LANE), -1, np.int32)
            for ri, (prow, vrow, irow) in enumerate(rA):
                pkc[ri], vlc[ri], ixc[ri] = prow, vrow, irow
            for ri, (prow, vrow, irow) in enumerate(rB):
                pkc[half + ri], vlc[half + ri] = prow, vrow
                ixc[half + ri] = irow
            kind_c.append(kA)
            base_c.append(bA)
            kind2_c.append(kB)
            base2_c.append(bB)
            blk_c.append(b)
            chunks_pk.append(pkc)
            chunks_val.append(vlc)
            chunks_idx.append(ixc)
    nc = len(chunks_pk)
    pk = np.stack(chunks_pk)
    val = np.stack(chunks_val)
    eidx = np.stack(chunks_idx)

    got = np.zeros(n_pad, bool)
    if e:
        got[np.unique(np.asarray(receivers0))] = True
    return _maybe_validate(Spmv2Plan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(norm_windows), rows=rows,
        kindid=jnp.asarray(np.asarray(kind_c, np.int32)),
        blkid=jnp.asarray(np.asarray(blk_c, np.int32)),
        base=jnp.asarray(np.asarray(base_c, np.int32)),
        kind2=jnp.asarray(np.asarray(kind2_c, np.int32)),
        base2=jnp.asarray(np.asarray(base2_c, np.int32)),
        pk=jnp.asarray(pk), val=jnp.asarray(val),
        got_static=jnp.asarray(got), eidx=eidx))


def _build_plan2_native(lib, s, r, v, e, h, wr, nb, hub, windows,
                        cell_min, n_pad, n_send_pad, receivers0,
                        rows=ROWS):
    """C++/OpenMP v2r plan build (graphmat_tpu/native/planner.cpp)."""
    import ctypes

    sa = np.ascontiguousarray(s, np.int32)
    ra = np.ascontiguousarray(r, np.int32)
    va = np.ascontiguousarray(v, np.float32)
    wins = np.ascontiguousarray(windows, np.int32)
    nc_out = ctypes.c_int64()
    handle = lib.gm_plan2_create(sa, ra, va, e, h, wr, nb, hub, wins,
                                 len(wins), cell_min, rows,
                                 ctypes.byref(nc_out))
    nc = int(nc_out.value)
    try:
        kindid = np.empty(nc, np.int32)
        blkid = np.empty(nc, np.int32)
        base = np.empty(nc, np.int32)
        kind2 = np.empty(nc, np.int32)
        base2 = np.empty(nc, np.int32)
        pk = np.empty((nc, rows, LANE), np.int32)
        val = np.empty((nc, rows, LANE), np.float32)
        lib.gm_plan2_fill(handle, kindid, blkid, base, kind2, base2,
                          pk.reshape(-1), val.reshape(-1))
        eidx = None
        if hasattr(lib, "gm_plan2_eidx"):
            eidx = np.empty((nc, rows, LANE), np.int32)
            lib.gm_plan2_eidx(handle, eidx.reshape(-1))
    finally:
        lib.gm_plan2_destroy(handle)

    got = np.zeros(n_pad, bool)
    got[np.unique(np.asarray(receivers0))] = True
    return _maybe_validate(Spmv2Plan(
        n_pad=n_pad, n_send_pad=n_send_pad, h=h, wr=wr, nb=nb, nc=nc,
        hub=hub, nnz=e, fill=e / max(nc * rows * LANE, 1),
        classes=tuple(int(w) for w in windows), rows=rows,
        kindid=jnp.asarray(kindid), blkid=jnp.asarray(blkid),
        base=jnp.asarray(base), kind2=jnp.asarray(kind2),
        base2=jnp.asarray(base2),
        pk=jnp.asarray(pk), val=jnp.asarray(val),
        got_static=jnp.asarray(got), eidx=eidx))


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
                 sparse=False, use_val=True, want_got=False):
    """``want_got``: the caller has encoded the sender-activity bit into
    the LOW MANTISSA BIT of every x value (inactive senders carry exactly
    0.0).  The kernel strips the bit before ⊗ — stealing the bit perturbs
    each x by at most 1 ulp (2^-24 relative; exact for integer payloads
    < 2^23) — and scatters it as ONE extra count plane in the same MXU
    matmul, so the y bitvector costs G extra accumulator rows instead of
    a second full SpMV (the reference sets the y bitvector inside the
    multiply loop, ``singlenode/spmspv.h:64-81``)."""
    G = wr // LANE
    wmax = max(classes)
    chunk = rows * LANE
    ntiles = rows // 8
    htiles = ntiles // 2          # tiles per half-chunk

    def kernel(kind_ref, blk_ref, base_ref, kind2_ref, base2_ref, *rest):
        if sparse:
            act_ref = rest[0]
            rest = rest[2:]   # rest[1] = eff_ref, used by index maps only
        if use_val:
            (pk_ref, val_ref, x2_ref, y_ref,
             acc_ref, wscr_ref, *dma_sem) = rest
        else:
            (pk_ref, x2_ref, y_ref, acc_ref, wscr_ref, *dma_sem) = rest
            val_ref = None
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
            us = [jax.lax.bitcast_convert_type(
                      pk_ref[0, 8 * t: 8 * t + 8, :], jnp.uint32)
                  for t in range(ntiles)]
            hi2s = [(u >> 21).astype(jnp.int32) for u in us]
            slos = [((u >> RCF_BITS) & (LANE - 1)).astype(jnp.int32)
                    for u in us]
            subs = [ix & 7 for ix in hi2s]
            gsels = [ix >> 3 for ix in hi2s]

            def gather_half(tsel, kind_v, base_v, skip_load):
                """One half-chunk's gather: window select + statically
                unrolled granule walk over the half's tiles (a dynamic
                trip count costs ~86 ns/granule in loop+slice overhead)."""

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
                        # hub senders live in x2 rows [0, 16) (HBM mode:
                        # the VMEM mirror at the tail of wscr)
                        if x2_hbm:
                            return wscr_ref[wmax + 8 * g:
                                            wmax + 8 * g + 8, :]
                        return x2_ref[8 * g: 8 * g + 8, :]
                    return gather_from(tbl, HUB_GRANULES2)

                def window_branch(W):
                    def inner():
                        base = pl.multiple_of(base_v, 8)

                        @pl.when(jnp.logical_not(skip_load))
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

                branches = [hub_branch] + [window_branch(W)
                                           for W in classes]
                return list(jax.lax.switch(kind_v, branches))

            if debug == "nogather":
                xvs = [jnp.full((8, LANE), 1.0, jnp.float32)
                       for _ in range(ntiles)]
            else:
                # window-reuse (same_win) chain across halves:
                # [A_{i-1}, B_{i-1}, A_i, B_i, ...] — skip the load when
                # the window equals the one wscr already holds.  Hub
                # halves don't touch wscr[0:W], so a window can also
                # survive across an interposed hub half.  In sparse mode
                # a skipped chunk loads nothing, so reuse from chunk i-1
                # additionally requires act[i-1].
                prev = jnp.maximum(i - 1, 0)
                prev_ok = i > 0
                if sparse:
                    prev_ok = jnp.logical_and(prev_ok, act_ref[prev] != 0)
                kA, bA = kind_ref[i], base_ref[i]
                kB, bB = kind2_ref[i], base2_ref[i]
                kP, bP = kind2_ref[prev], base2_ref[prev]
                sameA = jnp.logical_and(
                    prev_ok, jnp.logical_and(kA == kP, bA == bP))
                sameB = jnp.logical_or(
                    jnp.logical_and(kB == kA, bB == bA),
                    jnp.logical_and(
                        kA == 0, jnp.logical_and(
                            prev_ok,
                            jnp.logical_and(kB == kP, bB == bP))))
                xvs = (gather_half(list(range(htiles)), kA, bA, sameA)
                       + gather_half(list(range(htiles, ntiles)), kB, bB,
                                     sameB))
                # route each slot to its sender's registration lane
                xvs = [jnp.take_along_axis(xvs[t], slos[t], axis=1)
                       for t in range(ntiles)]

            if want_got:
                # strip the activity bit (int32 domain — Mosaic lacks
                # uint32->f32 casts); the engine set it on active senders
                xbs = [jax.lax.bitcast_convert_type(xv, jnp.int32)
                       for xv in xvs]
                af = jnp.concatenate(
                    [(xb & 1).astype(jnp.float32) for xb in xbs],
                    axis=0).reshape(1, chunk)
                xvs = [jax.lax.bitcast_convert_type(
                           xb & np.int32(-2), jnp.float32)
                       for xb in xbs]

            ps = [process(xvs[t],
                          val_ref[0, 8 * t: 8 * t + 8, :] if use_val
                          else jnp.float32(0.0)).astype(
                jnp.float32) for t in range(ntiles)]
            p = jnp.concatenate(ps, axis=0)               # [rows, 128]
            if debug == "noscatter":
                acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(
                    p, axis=0, keepdims=True)
                y_ref[0] = acc_ref[:]
                return
            pf = p.reshape(1, chunk)                      # [1, rows*128]

            # ---- factored scatter: one MXU matmul ----
            rcf = (jax.lax.bitcast_convert_type(pk_ref[0], jnp.uint32)
                   & ((1 << RCF_BITS) - 1)).astype(jnp.int32).reshape(
                       1, chunk)
            rcg = rcf >> 7
            rcl = rcf & (LANE - 1)
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (G, chunk), 0)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANE, chunk), 0)
            ohlo = (iota_l == rcl).astype(jnp.bfloat16)   # [128, chunk]
            gm = iota_g == rcg                            # [G, chunk]
            planes = [jnp.where(gm,
                                jnp.broadcast_to(part.astype(jnp.float32),
                                                 gm.shape), 0.0)
                      for part in _split_bf16(pf, n_splits)]
            if want_got:
                # 0/1 activity plane — exact in bf16, counts exact in the
                # f32 matmul accumulator up to 2^24
                planes.append(jnp.where(
                    gm, jnp.broadcast_to(af, gm.shape), 0.0))
            P = jnp.concatenate(planes, axis=0).astype(jnp.bfloat16)
            M = jax.lax.dot_general(P, ohlo, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            contrib = M[0:G]
            for k in range(1, n_splits):
                contrib = contrib + M[k * G:(k + 1) * G]
            if want_got:
                acc_ref[0:G, :] = acc_ref[0:G, :] + contrib
                acc_ref[G:2 * G, :] = (acc_ref[G:2 * G, :]
                                       + M[n_splits * G:
                                           (n_splits + 1) * G])
            else:
                acc_ref[:] = acc_ref[:] + contrib         # [G, 128]

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


def _chunk_activity(sent, kindid, base, classes, h, nc,
                    kind2=None, base2=None):
    """Per-chunk frontier activity + effective-block routing.

    ``sent``: bool[h*128] sender activity in X2 layout.  A chunk is active
    iff any sender in either half's gather range is — hub halves read X2
    rows [0, 16), window halves [base, base + W).  Activity is thus a
    function of the halves' (kind, base) alone, which the kernel's
    window-reuse skip relies on.  ``eff[i]`` = most recent active chunk
    id <= i (leading inactive chunks route to block 0): inactive chunks'
    plan blocks become pipeline revisits and are never fetched.
    """
    rowact = jnp.any(sent.reshape(h, LANE), axis=1).astype(jnp.int32)
    pref = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(rowact)])
    # rows gathered per kind: hub = 16 (hub <= 16*128 senders), else W
    wlen = jnp.asarray(np.array([16] + list(classes), np.int64),
                       dtype=jnp.int32)

    def half_act(kd, bs):
        L = jnp.take(wlen, kd)
        b = jnp.where(kd == 0, 0, bs)
        return (pref[jnp.minimum(b + L, h)] - pref[b]) > 0

    cact = half_act(kindid, base)
    if kind2 is not None:
        cact = cact | half_act(kind2, base2)
    idxs = jnp.arange(nc, dtype=jnp.int32)
    eff = jax.lax.cummax(jnp.where(cact, idxs, -1))
    return cact.astype(jnp.int32), jnp.maximum(eff, 0)


@functools.partial(jax.jit, static_argnames=("plan_static", "process",
                                              "n_splits", "interpret",
                                              "debug", "x2_hbm",
                                              "want_got"))
def _spmv2_call(plan_arrays, plan_static, x, process, n_splits, interpret,
                debug=None, x2_hbm=None, sent=None, want_got=False):
    h, wr, nb, nc, n_pad, classes = plan_static[:6]
    rows = plan_static[6] if len(plan_static) > 6 else ROWS
    kindid, blkid, base, kind2, base2, pk, val = plan_arrays
    use_val = val is not None
    G = wr // LANE
    GA = 2 * G if want_got else G   # got mode: G extra count rows
    x2 = x.reshape(h, LANE)
    sparse = sent is not None
    if sparse:
        if sent.shape[0] < h * LANE:
            sent = jnp.pad(sent, (0, h * LANE - sent.shape[0]))
        act, eff = _chunk_activity(sent[: h * LANE], kindid, base,
                                   classes, h, nc, kind2, base2)

    if x2_hbm is None:
        x2_hbm = h > VMEM_X2_MAX_ROWS and not interpret
    kernel = _make_kernel(process, wr, h, n_splits, classes, debug,
                          x2_hbm, rows, sparse, use_val, want_got)
    wmax = max(classes) if classes else 8
    if sparse:
        nmap = lambda i, kd, bk, bs, k2, b2, a, eff_: (eff_[i], 0, 0)
        omap = lambda i, kd, bk, bs, k2, b2, a, eff_: (bk[i], 0, 0)
    else:
        nmap = lambda i, *_: (i, 0, 0)
        omap = lambda i, kind, blk, bs, k2, b2: (blk[i], 0, 0)
    chunk_spec = pl.BlockSpec((1, rows, LANE), nmap,
                              memory_space=pltpu.VMEM)
    x2_spec = pl.BlockSpec(memory_space=(pltpu.ANY if x2_hbm
                                         else pltpu.VMEM))
    # HBM mode: wscr gains a 16-row mirror of x2[0:16] for hub granules
    scratch = [pltpu.VMEM((GA, LANE), jnp.float32),
               pltpu.VMEM((wmax + (16 if x2_hbm else 0), LANE),
                          jnp.float32)]
    if x2_hbm:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7 if sparse else 5,
        grid=(nc,),
        in_specs=([chunk_spec, chunk_spec, x2_spec] if use_val
                  else [chunk_spec, x2_spec]),
        out_specs=pl.BlockSpec((1, GA, LANE), omap,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    operands = ((kindid, blkid, base, kind2, base2, act, eff) if sparse
                else (kindid, blkid, base, kind2, base2))
    planes = (pk, val, x2) if use_val else (pk, x2)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, GA, LANE), jnp.float32),
        interpret=interpret,
    )(*operands, *planes)
    if want_got:
        return (out[:, :G].reshape(nb * wr)[:n_pad],
                out[:, G:].reshape(nb * wr)[:n_pad])
    return out.reshape(nb * wr)[:n_pad]


def _identity_process(xv, ev):
    return xv


def encode_sent_bit(x, sent):
    """Encode the sender-activity mask into the LOW MANTISSA BIT of x.

    The bit rides the kernel's bit-preserving gathers (take_along_axis,
    window copies, DMAs); the kernel strips it before ⊗ and scatters it
    as a count plane — got[r] = count[r] > 0 (``want_got``).  Stealing
    the bit perturbs each active x by at most 1 ulp (2^-24 relative;
    integer payloads < 2^23 are exact).  Inactive senders must already
    carry exactly 0.0 in ``x``.
    """
    xb = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    xb = (xb & np.uint32(0xFFFFFFFE)) | sent.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(xb, jnp.float32)


def refresh_plan_vals(plan, new_vals) -> bool:
    """Patch a plan's edge-value plane in place for updated edge values
    (same graph structure) via the host eidx map — the applyToAllEdges
    fast path: no replan of routing/coloring (the reference mutates tile
    vals in place, ``singlenode/applyedges.h:38-95``).  ``new_vals`` is in
    the ORIGINAL edge order the plan was built from.  Returns False when
    the plan carries no eidx map (caller should rebuild)."""
    if getattr(plan, "eidx", None) is None:
        return False
    nv = np.asarray(new_vals, np.float32)
    ei = plan.eidx
    val = np.where(ei >= 0, nv[np.maximum(ei, 0)], np.float32(0.0))
    plan.val = jnp.asarray(val.astype(np.float32))
    return True


def _maybe_validate(plan, mm=False):
    from ..utils.debug import (debug_enabled, validate_plan2,
                               validate_plan2m)
    if debug_enabled():
        (validate_plan2m if mm else validate_plan2)(plan)
    return plan


def spmv2(plan: Spmv2Plan, x, reduce_kind: str = "sum",
          process: Optional[Callable] = None, interpret: bool = False,
          n_splits: int = 3, sent=None, with_got: bool = False):
    """Generalized SpMV: ``y[r] = sum_{(s->r)} process(x[s], val)``.

    ``x``: f32[plan.n_send_pad] (shorter inputs are padded).  Returns
    f32[plan.n_pad].  v2 supports ⊕ = sum; the engine routes min/max to
    the mm kernel.

    ``sent``: optional bool[n_send_pad] sender-activity mask enabling the
    sparse-frontier fast path — chunks whose gather range holds no active
    sender contribute exactly 0 and their plan blocks are never fetched.
    Inactive senders inside active chunks must already carry 0 in ``x``
    (the engine masks them), so skipping removes only exact zeros.

    ``with_got``: also return ``got`` (bool[n_pad]: receiver heard from an
    active sender), folded into the same kernel launch as one extra count
    plane (requires ``sent``) — the reference sets the y bitvector inside
    the multiply loop (``singlenode/spmspv.h:64-81``).
    """
    if reduce_kind != "sum":
        raise NotImplementedError("spmv2 supports sum only")
    if process is None:
        process = _identity_process
    if x.shape[0] < plan.n_send_pad:
        x = jnp.pad(x, (0, plan.n_send_pad - x.shape[0]))
    x = x[: plan.n_send_pad].astype(jnp.float32)
    plan_arrays = (plan.kindid, plan.blkid, plan.base, plan.kind2,
                   plan.base2, plan.pk, plan.val)
    plan_static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
                   plan.classes, plan.rows)
    if with_got:
        assert sent is not None, "with_got requires the sent mask"
        sent_p = sent
        if sent_p.shape[0] < plan.n_send_pad:
            sent_p = jnp.pad(sent_p, (0, plan.n_send_pad - sent_p.shape[0]))
        x = jnp.where(sent_p[: plan.n_send_pad], x, 0.0)
        x = encode_sent_bit(x, sent_p[: plan.n_send_pad])
        y, cnt = _spmv2_call(plan_arrays, plan_static, x, process,
                             n_splits, interpret, sent=sent,
                             want_got=True)
        return y, cnt > 0
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
    pk: Any               # i32[nc,rows,128] hi2<<21 | slo<<14 | rcf (the
                          # same packed plane as the sum layout; pads = wr)
    val: Any              # f32[nc,rows,128] per-slot edge value
    got_static: Any
    eidx: Any = None      # host i32[nc,rows,128]: slot -> original edge
                          # index (-1 pads) — enables val-only refresh


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
        ie = idxs.astype(np.int32)
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
        rm_rows = []   # (hi2row, slorow, valrow, rcfrow, idxrow)
        if ishot.any():
            for rv in sorted(hotset):
                m = re_ == rv
                slh, freeh, seh, veh = sl[m], free[m], se[m], ve[m]
                ieh = ie[m]
                rwh, sxh, nrh = _pack_rowmode(slh, freeh)
                for rr in range(nrh):
                    mm_ = rwh == rr
                    h2 = np.zeros(LANE, np.int32)
                    sr = np.zeros(LANE, np.int32)
                    vr = np.zeros(LANE, np.float32)
                    rcr = np.full(LANE, wr, np.int32)
                    ir = np.full(LANE, -1, np.int32)
                    h2[sxh[mm_]] = gidx_of(seh[mm_])
                    sr[sxh[mm_]] = sxh[mm_]
                    vr[sxh[mm_]] = veh[mm_]
                    rcr[sxh[mm_]] = rv - blk * wr
                    ir[sxh[mm_]] = ieh[mm_]
                    rm_rows.append((h2, sr, vr, rcr, ir))
        # row-mode rows fill whole chunks (rowmask bits set per used row)
        for c0 in range(0, len(rm_rows), RW):
            grp = rm_rows[c0:c0 + RW]
            hi2 = np.zeros((RW, LANE), np.int32)
            slo = np.zeros((RW, LANE), np.int32)
            vv = np.zeros((RW, LANE), np.float32)
            rcq = np.full((RW, LANE), wr, np.int32)
            ixq = np.full((RW, LANE), -1, np.int32)
            for i, (h2, sr, vr, rcr, ir) in enumerate(grp):
                hi2[i], slo[i], vv[i], rcq[i], ixq[i] = h2, sr, vr, rcr, ir
            rowmask = -1 if len(grp) >= 32 else (1 << len(grp)) - 1
            chunks.append((kd, blk, base, ng, hi2, slo, vv, rcq, rowmask,
                           ixq))

        cold = ~ishot
        if cold.any():
            rlc, slc, freec = rl[cold], sl[cold], free[cold]
            sec, vec, rec = se[cold], ve[cold], re_[cold]
            iec = ie[cold]
            ch, rw, sx, ncc = _pack_colored(rlc, slc, freec, rows)
            for c in range(ncc):
                m = ch == c
                hi2 = np.zeros((rows, LANE), np.int32)
                slo = np.zeros((rows, LANE), np.int32)
                vv = np.zeros((rows, LANE), np.float32)
                rcq = np.full((rows, LANE), wr, np.int32)
                ixq = np.full((rows, LANE), -1, np.int32)
                ri, sxi, rli = rw[m], sx[m], rlc[m]
                gi2 = gidx_of(sec[m])
                hi2[ri, sxi] = gi2
                slo[ri, rli] = sxi
                vv[ri, rli] = vec[m]
                rcq[ri, rli] = (rec[m] - blk * wr).astype(np.int32)
                ixq[ri, rli] = iec[m]
                chunks.append((kd, blk, base, ng, hi2, slo, vv, rcq, 0,
                               ixq))

    covered = {c[1] for c in chunks}
    for b in range(nb):
        if b not in covered:
            chunks.append((0, b, 0, HUB_GRANULES,
                           np.zeros((rows, LANE), np.int32),
                           np.zeros((rows, LANE), np.int32),
                           np.zeros((rows, LANE), np.float32),
                           np.full((rows, LANE), wr, np.int32), 0,
                           np.full((rows, LANE), -1, np.int32)))
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
        pk=jnp.asarray(
            ((np.stack([c[4] for c in chunks]).astype(np.uint32) << 21)
             | (np.stack([c[5] for c in chunks]).astype(np.uint32)
                << RCF_BITS)
             | np.stack([c[7] for c in chunks]).astype(np.uint32)
             ).view(np.int32)),
        val=jnp.asarray(np.stack([c[6] for c in chunks])),
        got_static=jnp.asarray(got),
        eidx=np.stack([c[9] for c in chunks])), mm=True)


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
        pk = np.empty((nc, rows, LANE), np.int32)
        val = np.empty((nc, rows, LANE), np.float32)
        lib.gm_plan2m_fill(handle, kindid, blkid, base, ngran, rowmask,
                           pk.reshape(-1), val.reshape(-1))
        eidx = None
        if hasattr(lib, "gm_plan2m_eidx"):
            eidx = np.empty((nc, rows, LANE), np.int32)
            lib.gm_plan2m_eidx(handle, eidx.reshape(-1))
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
        pk=jnp.asarray(pk), val=jnp.asarray(val),
        got_static=jnp.asarray(got), eidx=eidx), mm=True)


def _make_kernel_mm(reduce_kind: str, process: Callable, wr: int, h: int,
                    classes, x2_hbm=False, rows=ROWS, sparse=False,
                    use_val=True, debug=None):
    G = wr // LANE
    wmax = max(classes)
    ntiles = rows // 8
    ident = np.float32(np.inf if reduce_kind == "min" else -np.inf)
    comb = jnp.minimum if reduce_kind == "min" else jnp.maximum

    def kernel(kind_ref, blk_ref, base_ref, rowmask_ref, *rest):
        if sparse:
            act_ref = rest[0]
            rest = rest[2:]   # rest[1] = eff_ref, used by index maps only
        if use_val:
            (pk_ref, val_ref, x2_ref, xtop_ref,
             xrot_ref, y_ref, acc_ref, wscr_ref, *dma_sem) = rest
        else:
            (pk_ref, x2_ref, xtop_ref, xrot_ref,
             y_ref, acc_ref, wscr_ref, *dma_sem) = rest
            val_ref = None
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
            us = [jax.lax.bitcast_convert_type(
                      pk_ref[0, 8 * t: 8 * t + 8, :], jnp.uint32)
                  for t in range(ntiles)]
            hi2s = [(u >> 21).astype(jnp.int32) for u in us]
            slos = [((u >> RCF_BITS) & (LANE - 1)).astype(jnp.int32)
                    for u in us]
            subs = [ix & 7 for ix in hi2s]
            gsels = [ix >> 3 for ix in hi2s]

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

            if debug == "nogather":
                qs = [jnp.full((8, LANE), 1.0, jnp.float32)
                      for _ in range(ntiles)]
            else:
                branches = [hub_branch] + [window_branch(W)
                                           for W in classes]
                qs = list(jax.lax.switch(kind_ref[i], branches))

            # route to receiver-lane slots, then process
            ps = []
            for t in range(ntiles):
                xv = jnp.take_along_axis(qs[t], slos[t], axis=1)
                ps.append(process(
                    xv, val_ref[0, 8 * t: 8 * t + 8, :] if use_val
                    else jnp.float32(0.0)).astype(jnp.float32))
            p = jnp.concatenate(ps, axis=0)                # [rows,128]
            rcf = (jax.lax.bitcast_convert_type(pk_ref[0], jnp.uint32)
                   & ((1 << RCF_BITS) - 1)).astype(jnp.int32)  # pads = wr

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

            if debug == "noscatter":
                red = red_ax1(p, axis=0, keepdims=True)
                acc_ref[0:1, :] = comb(acc_ref[0:1, :], red)
                return
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
                                              "x2_hbm", "debug"))
def _spmv2m_call(plan_arrays, plan_static, x, reduce_kind, process,
                 interpret, x2_hbm=None, sent=None, debug=None):
    h, wr, nb, nc, n_pad, classes = plan_static[:6]
    rows = plan_static[6] if len(plan_static) > 6 else ROWS
    kindid, blkid, base, ngran, rowmask, pk, val = plan_arrays
    del ngran
    use_val = val is not None
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
                             rows, sparse, use_val, debug)
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
        in_specs=[chunk_spec] * (2 if use_val else 1)
        + [x2_spec,
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, LANE), omap,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    operands = ((kindid, blkid, base, rowmask, act, eff) if sparse
                else (kindid, blkid, base, rowmask))
    planes = (pk, val) if use_val else (pk,)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        interpret=interpret,
    )(*operands, *planes, x2, xtop, xrot)
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
                   plan.rowmask, plan.pk, plan.val)
    plan_static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
                   plan.classes, plan.rows)
    return _spmv2m_call(plan_arrays, plan_static, x, reduce_kind, process,
                        interpret, sent=sent)
