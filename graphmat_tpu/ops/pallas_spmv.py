"""Pallas TPU generalized-SpMV kernels — the hot loop.

This is the TPU-native replacement for the reference's ``my_spmspv`` DCSC
inner loops (``include/GMDP/singlenode/spmspv.h:39-314``).  Plain XLA
gather/scatter is unusable on TPU at graph scale (measured 0.004 GTEPS for a
16M-edge segment_sum), so the kernel re-expresses both sides of the SpMV in
MXU/VPU-friendly form:

* **Edge plan (host, once per graph)**: edges sorted by
  (receiver-block, sender) and packed into 128-edge *rows* such that

  - every receiver in a row lies in the row's 512-wide receiver block, and
  - every sender lies in a 128-row window of the lane-tiled operand
    ``X2[h, l] = x[h*128 + l]`` (an 8-aligned ``hi_base``).

  Rows are padded (mask stream) and grouped into 8-row chunks; chunks of one
  receiver block are consecutive, so the output block accumulates in VMEM
  across the sequential grid (PrefetchScalarGridSpec block ids pick the
  output window).  Every receiver block emits at least one chunk so all of
  ``y`` is written.

* **Gather (per row)**: one-hot ``OH[h, e] = (hi_rel[e] == h)`` (bf16,
  exact) contracted with the X2 window on the MXU selects each edge's
  sender row; the lane entry is extracted with a masked lane-sum.  f32
  exactness comes from the classic hi/lo bf16 split: gathering the two
  splits through exact one-hots reconstructs x to ~2^-17 relative.

* **⊗**: an arbitrary user ``process(xv, edge_val)`` — the GraphProgram
  semiring multiply, traced INTO the kernel — masked by the pad stream.

* **⊕-scatter (per row)**: one-hot ``OH[e, w] = (recv_rel[e] == w)``;
  ``⊕ = sum`` contracts products against it on the MXU (hi/lo split again);
  ``⊕ = min/max`` replaces the matmul with a masked reduce over the edge
  axis on the VPU.

The reference's 32-row-aligned thread partitions (``DCSCTile.h:247-249``)
play the same role as the receiver blocks here: conflict-free parallel
reduction windows.  Dynamic frontiers (ACTIVE_ONLY programs) mask ``x``
outside the kernel and obtain ``got_message`` with a second pass over the
same plan (``x = sent ? 1 : 0``, ⊕ = sum, result > 0).
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

__all__ = ["SpmvPlan", "build_spmv_plan", "spmv"]

LANE = 128
ROWS_PER_CHUNK = 8
EDGES_PER_CHUNK = LANE * ROWS_PER_CHUNK  # (128-edge-row layouts)


@dataclass
class SpmvPlan:
    """Host-built static edge plan feeding the Pallas kernel."""

    n_pad: int          # padded receiver count (multiple of wr)
    n_send_pad: int     # padded sender count (= h * 128)
    wr: int             # receiver block width
    nb: int             # number of receiver blocks = n_pad // wr
    nc: int             # number of chunks
    h: int              # X2 rows (senders / 128, tile-aligned)
    row_e: int          # edges per greedy row (lane-width multiple)
    win: int            # sender window height in X2 rows
    nnz: int
    fill: float         # nnz / (nc * EDGES_PER_CHUNK)
    blkid: Any          # int32[nc]    receiver block per chunk (nondecreasing)
    hiabs: Any          # int32[nc, 8, 128] absolute sender hi (s >> 7); row
                        #   padding lanes repeat the row's first hi so the
                        #   in-kernel row-min recovers the 8-aligned window base
    slo: Any            # int32[nc, 8, 128] sender & 127
    rrel: Any           # int32[nc, 8, 128] receiver - block*wr, in [0, wr)
    vals: Any           # f32[nc, 8, 128] edge values
    mask: Any           # f32[nc, 8, 128] 1.0 for real edges
    got_static: Any     # bool[n_pad] — receiver has >=1 real edge


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def build_spmv_plan(senders0: np.ndarray, receivers0: np.ndarray,
                    vals: np.ndarray, n: int, wr: int = 512,
                    n_recv: int | None = None, row_e: int = 256,
                    win: int = 256) -> SpmvPlan:
    """Pack a 0-based COO edge list into the chunked kernel layout.

    Greedy row formation keeps fill high: within a receiver block, edges
    are sender-sorted and consumed up to ``row_e`` at a time, breaking
    early when the sender-hi span would exceed the ``win``-row window
    (8-aligned base).  Wider rows amortize the kernel's per-row serial
    issue cost (the measured bottleneck); wider windows cost gather MACs.
    The (256, 256) default is the measured sweet spot on v5e.

    ``n`` is the sender-space size; ``n_recv`` (default ``n``) the receiver
    space — they differ for distributed tiles (column vs row block sizes).
    """
    if n_recv is None:
        n_recv = n
    # sender space sizing (X2 operand): need >= 128 rows for window
    # slices.  h is rounded to a full 128-row tile: the clamped window
    # base (h - 128) keeps its 8-alignment promise (pl.multiple_of), and
    # non-tile-aligned sublane counts measurably slow Mosaic's dynamic
    # slices (8200 rows ran 3.3x slower than 8192).
    h = max(_round_up(_round_up(n, LANE) // LANE, LANE), LANE)
    n_send_pad = h * LANE
    win = min(win, h)
    assert row_e % LANE == 0 and win % 8 == 0
    # receiver space sizing (y)
    n_pad = max(_round_up(n_recv, wr), wr)
    nb = n_pad // wr
    e = senders0.shape[0]

    from ..native import load_planner
    lib = load_planner()
    if lib is not None and e > 0:
        return _build_plan_native(lib, senders0, receivers0, vals, n_pad,
                                  n_send_pad, h, wr, nb, e, row_e, win)
    s = np.ascontiguousarray(senders0.astype(np.int64))
    r = np.ascontiguousarray(receivers0.astype(np.int64))
    v = np.ascontiguousarray(vals.astype(np.float32))

    rblk = r // wr
    order = np.lexsort((s, rblk))
    s, r, v, rblk = s[order], r[order], v[order], rblk[order]
    hi = (s >> 7).astype(np.int64)

    blk_starts = np.searchsorted(rblk, np.arange(nb + 1))

    # greedy rows: (block, start, stop, hi_base); every block contributes
    # at least one (possibly empty) chunk so its y window gets written.
    rows = []
    rows_per_block = np.zeros(nb, np.int64)
    for b in range(nb):
        i, end = int(blk_starts[b]), int(blk_starts[b + 1])
        cnt = 0
        while i < end:
            base = min(int(hi[i] & ~np.int64(7)), h - win)
            j = int(np.searchsorted(hi[i:end], base + win)) + i
            stop = min(i + row_e, j)
            rows.append((b, i, stop, base))
            cnt += 1
            i = stop
        rows_per_block[b] = cnt

    chunks_per_block = np.maximum((rows_per_block + ROWS_PER_CHUNK - 1)
                                  // ROWS_PER_CHUNK, 1)
    nc = int(chunks_per_block.sum())

    blkid = np.zeros(nc, np.int32)
    hiabs = np.zeros((nc, ROWS_PER_CHUNK, row_e), np.int32)
    slo = np.zeros((nc, ROWS_PER_CHUNK, row_e), np.int32)
    rrel = np.zeros((nc, ROWS_PER_CHUNK, row_e), np.int32)
    vv = np.zeros((nc, ROWS_PER_CHUNK, row_e), np.float32)
    mm = np.zeros((nc, ROWS_PER_CHUNK, row_e), np.float32)

    chunk_base = np.concatenate([[0], np.cumsum(chunks_per_block)])
    for b in range(nb):
        blkid[chunk_base[b]: chunk_base[b + 1]] = b
    row_ptr = 0
    for b in range(nb):
        ci0 = int(chunk_base[b])
        for k in range(int(rows_per_block[b])):
            _b, st, sp, hb = rows[row_ptr]
            row_ptr += 1
            ci = ci0 + k // ROWS_PER_CHUNK
            ri = k % ROWS_PER_CHUNK
            ln = sp - st
            hiabs[ci, ri, :ln] = hi[st:sp]
            hiabs[ci, ri, ln:] = hb
            slo[ci, ri, :ln] = s[st:sp] & 127
            rrel[ci, ri, :ln] = r[st:sp] - b * wr
            vv[ci, ri, :ln] = v[st:sp]
            mm[ci, ri, :ln] = 1.0
    assert row_ptr == len(rows)

    got = np.zeros(n_pad, bool)
    if e:
        got[np.unique(receivers0)] = True

    return SpmvPlan(
        n_pad=n_pad, n_send_pad=n_send_pad, wr=wr, nb=nb, nc=nc, h=h,
        row_e=row_e, win=win, nnz=e,
        fill=e / max(nc * ROWS_PER_CHUNK * row_e, 1),
        blkid=jnp.asarray(blkid),
        hiabs=jnp.asarray(hiabs), slo=jnp.asarray(slo),
        rrel=jnp.asarray(rrel), vals=jnp.asarray(vv),
        mask=jnp.asarray(mm), got_static=jnp.asarray(got))


def _build_plan_native(lib, senders0, receivers0, vals, n_pad, n_send_pad,
                       h, wr, nb, e, row_e, win):
    """C++/OpenMP plan build (graphmat_tpu/native/planner.cpp)."""
    import ctypes

    s = np.ascontiguousarray(senders0, np.int32)
    r = np.ascontiguousarray(receivers0, np.int32)
    v = np.ascontiguousarray(vals, np.float32)
    nc_out = ctypes.c_int64()
    handle = lib.gm_plan_create(s, r, v, e, h, wr, nb, row_e, win,
                                ctypes.byref(nc_out))
    nc = int(nc_out.value)
    try:
        blkid = np.empty(nc, np.int32)
        hiabs = np.empty((nc, ROWS_PER_CHUNK, row_e), np.int32)
        slo = np.empty((nc, ROWS_PER_CHUNK, row_e), np.int32)
        rrel = np.empty((nc, ROWS_PER_CHUNK, row_e), np.int32)
        vv = np.empty((nc, ROWS_PER_CHUNK, row_e), np.float32)
        mm = np.empty((nc, ROWS_PER_CHUNK, row_e), np.float32)
        lib.gm_plan_fill(handle, blkid, hiabs.reshape(-1), slo.reshape(-1),
                         rrel.reshape(-1), vv.reshape(-1), mm.reshape(-1))
    finally:
        lib.gm_plan_destroy(handle)

    got = np.zeros(n_pad, bool)
    got[np.unique(receivers0)] = True
    return SpmvPlan(
        n_pad=n_pad, n_send_pad=n_send_pad, wr=wr, nb=nb, nc=nc, h=h,
        row_e=row_e, win=win, nnz=e,
        fill=e / max(nc * ROWS_PER_CHUNK * row_e, 1),
        blkid=jnp.asarray(blkid), hiabs=jnp.asarray(hiabs),
        slo=jnp.asarray(slo), rrel=jnp.asarray(rrel), vals=jnp.asarray(vv),
        mask=jnp.asarray(mm), got_static=jnp.asarray(got))


# --------------------------------------------------------------- kernel

def _split_bf16(x, n_splits):
    """Exact bf16 decomposition of f32: x = sum(parts) with each part
    exactly representable in bf16 (truncation via bit masking — safe under
    --xla_allow_excess_precision, which folds the naive x - bf16(x) form).
    n_splits=2 leaves ~2^-17 relative residual; 3 is f32-exact."""
    parts = []
    rem = x
    for k in range(n_splits - 1):
        u = jax.lax.bitcast_convert_type(rem, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000),
                                          jnp.float32)
        parts.append(hi.astype(jnp.bfloat16))
        rem = rem - hi
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _make_kernel(reduce_kind: str, process: Callable, wr: int, h: int,
                 n_splits: int, row_e: int, win: int):
    ident = {"sum": 0.0, "min": np.float32(np.inf),
             "max": np.float32(-np.inf)}[reduce_kind]

    def kernel(blk_ref, hiabs_ref, slo_ref, rrel_ref, vals_ref,
               mask_ref, *rest):
        xsplit_refs = rest[:1]
        y_ref, acc_ref = rest[1], rest[2]
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.full_like(acc_ref, ident)

        # All per-row vectors stay lane-major [1, row_e]; one-hots are
        # built as [sublane, lane] broadcast compares (no relayouts).
        iota_we = jax.lax.broadcasted_iota(jnp.int32, (win, row_e), 0)
        iota_le = jax.lax.broadcasted_iota(jnp.int32, (LANE, row_e), 0)
        iota_ns = jax.lax.broadcasted_iota(
            jnp.int32, (n_splits * LANE, row_e), 0) % LANE
        iota_wre = jax.lax.broadcasted_iota(jnp.int32, (wr, row_e), 0)

        def split3p(v):
            parts = []
            rem = v
            for k in range(n_splits):
                if k < n_splits - 1:
                    pu = jax.lax.bitcast_convert_type(rem, jnp.uint32)
                    phf = jax.lax.bitcast_convert_type(
                        pu & np.uint32(0xFFFF0000), jnp.float32)
                    parts.append(phf.astype(jnp.bfloat16))
                    rem = rem - phf
                else:
                    parts.append(rem.astype(jnp.bfloat16))
            return parts

        def row(rr, _):
            habs = hiabs_ref[0, rr, :].reshape(1, row_e)
            base = jnp.minimum((jnp.min(habs) // 8) * 8, h - win)
            base = pl.multiple_of(base, 8)
            oh = ((habs - base) == iota_we).astype(jnp.bfloat16)  # [win, e]
            # single window slice + matmul over all split planes; the
            # (iota % 128 == lo) masked reduce sums planes and lanes at
            # once — which IS the f32 reconstruction of the splits
            xw = xsplit_refs[0][pl.ds(base, win), :]     # [win, ns*128]
            m2 = jax.lax.dot_general(xw, oh, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            slo_row = slo_ref[0, rr, :].reshape(1, row_e)
            xv = jnp.sum(jnp.where(iota_ns == slo_row, m2, 0.0), axis=0,
                         keepdims=True)                           # [1, e]
            ev = vals_ref[0, rr, :].reshape(1, row_e)
            msk = mask_ref[0, rr, :].reshape(1, row_e)
            p = process(xv, ev).astype(jnp.float32)               # [1, e]
            rc = rrel_ref[0, rr, :].reshape(1, row_e)
            if reduce_kind == "sum":
                p = p * msk
                # factored scatter: wr = G x 128 lane groups; mask p by the
                # receiver's group, one-hot only the low 7 bits (measured
                # faster than one [wr, e] one-hot for wr >= 512)
                rc_lo = rc & 127
                rc_hi = rc >> 7
                ohlo = (iota_le == rc_lo).astype(jnp.bfloat16)    # [128, e]
                groups = []
                for gidx in range(wr // LANE):
                    pg = jnp.where(rc_hi == gidx, p, 0.0)
                    acc_g = None
                    for part in split3p(pg):
                        t = jax.lax.dot_general(
                            part, ohlo, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [1, 128]
                        acc_g = t if acc_g is None else acc_g + t
                    groups.append(acc_g)
                contrib = jnp.concatenate(groups, axis=1)         # [1, wr]
                acc_ref[:] = acc_ref[:] + contrib
            else:
                # acc laid out [wr, 1] so the lane-reduce lands in place
                sel = (iota_wre == rc) & (msk > 0)                # [wr, e]
                pw = jnp.where(sel, jnp.broadcast_to(p, sel.shape), ident)
                red = (jnp.min if reduce_kind == "min" else jnp.max)(
                    pw, axis=1, keepdims=True)                    # [wr, 1]
                acc_ref[:] = (jnp.minimum if reduce_kind == "min"
                              else jnp.maximum)(acc_ref[:], red)
            return 0

        jax.lax.fori_loop(0, ROWS_PER_CHUNK, row, 0)
        if reduce_kind == "sum":
            y_ref[0, 0:1, :] = acc_ref[:]
        else:
            y_ref[0, 0:1, :] = acc_ref[:].reshape(1, wr)

    return kernel


@functools.partial(jax.jit, static_argnames=("plan_static", "reduce_kind",
                                             "process", "interpret",
                                             "n_splits"))
def _spmv_call(plan_arrays, plan_static, x, reduce_kind, process, interpret,
               n_splits=3):
    nc, nb, wr, h, n_pad, row_e, win = plan_static
    blkid, hiabs, slo, rrel, vals, mask = plan_arrays

    x2 = x.reshape(h, LANE)
    xsplits = [jnp.concatenate(_split_bf16(x2, n_splits), axis=1)]

    kernel = _make_kernel(reduce_kind, process, wr, h, n_splits, row_e, win)

    chunk_spec = pl.BlockSpec((1, ROWS_PER_CHUNK, row_e),
                              lambda i, blk: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=([chunk_spec] * 5
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, 8, wr), lambda i, blk: (blk[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, wr) if reduce_kind == "sum"
                                   else (wr, 1), jnp.float32)],
    )

    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, wr), jnp.float32),
        interpret=interpret,
    )(blkid, hiabs, slo, rrel, vals, mask, *xsplits)
    return out[:, 0, :].reshape(nb * wr)[:n_pad]


def _identity_process(xv, ev):
    return xv


def spmv(plan: SpmvPlan, x, reduce_kind: str = "sum",
         process: Optional[Callable] = None, interpret: bool = False,
         n_splits: int = 3):
    """Generalized SpMV: ``y[r] = ⊕_{(s→r)} process(x[s], val)``.

    ``x``: f32[plan.n_pad] (longer inputs are sliced).  Returns f32[n_pad].
    ``process``: elementwise jnp-traceable ``f(xv, edge_val)`` (default xv).
    For receivers with no edges, y holds the ⊕ identity.
    """
    if process is None:
        process = _identity_process
    if x.shape[0] < plan.n_send_pad:
        x = jnp.pad(x, (0, plan.n_send_pad - x.shape[0]))
    x = x[: plan.n_send_pad].astype(jnp.float32)
    plan_arrays = (plan.blkid, plan.hiabs, plan.slo, plan.rrel,
                   plan.vals, plan.mask)
    plan_static = (plan.nc, plan.nb, plan.wr, plan.h, plan.n_pad,
                   plan.row_e, plan.win)
    return _spmv_call(plan_arrays, plan_static, x, reduce_kind, process,
                      interpret, n_splits)
