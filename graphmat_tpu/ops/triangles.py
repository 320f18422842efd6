"""Scalable exact triangle counting (degree-oriented, degree-bucketed).

The engine path (``apps.triangle_counting``) mirrors the reference
program structure (``src/TriangleCounting.cpp:80-156``) but materializes a
``[n, max_degree]`` neighbor matrix — fine for fixtures, infeasible for
power-law graphs at LiveJournal scale (max degree ~10^4 -> terabyte
intermediates on the gather).  This module is the TPU-native scalable
path:

* **Degree orientation**: each undirected edge {u, v} is oriented toward
  the (degree, id)-larger endpoint, which bounds every out-degree by
  O(sqrt(m)) and makes Σ |N⁺(u)| ∩-work ~ m^1.5 total — the standard
  load-balanced formulation.  Total triangles are orientation-invariant:
  Σ_{(u,v) oriented} |N⁺(u) ∩ N⁺(v)| counts each triangle exactly once
  (at its degree-middle vertex, where the engine path counts at the
  id-middle vertex — per-vertex attributions differ, totals match).

* **Degree buckets**: vertices are grouped into pad classes (x4 ladder),
  each class holding a *compact* ``[n_c, D_c]`` sorted neighbor matrix —
  total storage <= 4m int32 regardless of the degree distribution.

* **Batched intersection**: oriented edges are grouped by (sender class,
  receiver class); each group runs fixed-shape batches through a
  vectorized sorted-membership count (searching the smaller-padded side
  in the larger), accumulated with a `lax.scan` over batches.

Everything device-side is static-shape; all ragged work happens once on
the host in vectorized numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import PAD_ID

__all__ = ["count_triangles_bucketed"]


def _orient_csr(src0, dst0, n):
    """Dedup + degree-orient + CSR-sort.  Native (C++/OpenMP parallel
    sorts in planner.cpp::gm_tri_create) with a numpy fallback.
    Returns (s_s, r_s, rank, odeg) with edges sorted by (s, r)."""
    from ..native import load_planner
    lib = load_planner()
    if lib is not None and hasattr(lib, "gm_tri_create") and len(src0):
        import ctypes
        u = np.ascontiguousarray(src0, np.int32)
        v = np.ascontiguousarray(dst0, np.int32)
        m_out = ctypes.c_int64()
        h = lib.gm_tri_create(u, v, len(u), n, ctypes.byref(m_out))
        m = int(m_out.value)
        try:
            s_s = np.empty(m, np.int32)
            r_s = np.empty(m, np.int32)
            rank = np.empty(m, np.int32)
            odeg = np.empty(n, np.int32)
            lib.gm_tri_fill(h, s_s, r_s, rank, odeg)
        finally:
            lib.gm_tri_destroy(h)
        return (s_s.astype(np.int64), r_s.astype(np.int64),
                rank.astype(np.int64), odeg.astype(np.int64))

    u = np.asarray(src0, np.int64)
    v = np.asarray(dst0, np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    # dedup undirected pairs (the input may carry both directions) —
    # one sort of the packed key
    key = np.minimum(u, v) * np.int64(n) + np.maximum(u, v)
    key = np.sort(key)
    if len(key):
        key = key[np.r_[True, key[1:] != key[:-1]]]
    a, b = key // n, key % n

    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    # orient toward the (degree, id)-larger endpoint
    fwd = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    s = np.where(fwd, a, b)
    r = np.where(fwd, b, a)
    odeg = np.bincount(s, minlength=n)

    order = np.lexsort((r, s))
    s_s, r_s = s[order], r[order]
    first = np.r_[True, s_s[1:] != s_s[:-1]] if len(s_s) else \
        np.zeros(0, bool)
    seg_start = np.flatnonzero(first)
    seg_id = np.cumsum(first) - 1
    rank = np.arange(len(s_s)) - seg_start[seg_id] if len(s_s) else \
        np.zeros(0, np.int64)
    return s_s, r_s, rank, odeg


def _prep(src0, dst0, n, ladder=(16, 64, 256, 1024, 4096)):
    """Host prep: orient, bucket, group.  Returns (mats, groups, m)."""
    s_s, r_s, rank, odeg = _orient_csr(src0, dst0, n)

    dmax = int(odeg.max()) if len(s_s) else 1
    classes = [d for d in ladder if d < dmax] + [max(
        int(1 << int(np.ceil(np.log2(max(dmax, 1))))), 1)]
    classes = sorted(set(classes))
    cls_of = np.searchsorted(classes, np.maximum(odeg, 1))
    row_in_cls = np.full(n, -1, np.int64)
    mats = []
    cls_edge = cls_of[s_s] if len(s_s) else np.zeros(0, np.int64)
    for ci, D in enumerate(classes):
        vs = np.flatnonzero((cls_of == ci) & (odeg > 0))
        row_in_cls[vs] = np.arange(len(vs))
        mat = np.full((max(len(vs), 1) + 1, D), PAD_ID, np.int32)
        if len(vs):
            em = cls_edge == ci
            mat[row_in_cls[s_s[em]], rank[em]] = r_s[em]
        mats.append(mat)

    # group oriented edges by (sender class, receiver class); receivers
    # with odeg == 0 intersect empty sets — drop those edges outright.
    # <= |classes|^2 groups: per-group flatnonzero beats a third sort.
    live = odeg[r_s] > 0
    sl, rl = s_s[live], r_s[live]
    gkey = cls_of[sl] * len(classes) + cls_of[rl]
    present = np.flatnonzero(np.bincount(gkey,
                                         minlength=len(classes) ** 2))
    groups = []
    for gk in present:
        sel = np.flatnonzero(gkey == gk)
        sl_g, rl_g = sl[sel], rl[sel]
        cs, cr = divmod(int(gk), len(classes))
        Ds, Dr = classes[cs], classes[cr]
        if Ds * Dr <= _BCAST_MAX:
            # broadcast-compare group: ~1G fused compares per step.
            # Broadcast equality is pure VPU throughput and beats the
            # binary-search path for EVERY class pair on TPU: a
            # take_along_axis gather costs ~26 ns per element, so the
            # searches' 2·log2(D) gathered probes ran ~1.7 s per
            # 16K-edge batch (one group alone needed ~300 s of device
            # time in a single dispatch, which the runtime kills) where
            # the dense compare does the same batch in ~2 ms
            B = max(8, min(1 << 16, (1 << 30) // (Ds * Dr)) // 8 * 8)
        else:
            # binary-search fallback (D beyond any current class)
            logd = max(max(Ds, Dr) - 1, 1).bit_length()
            B = max(256, min(1 << 16,
                             (1 << 26) // (min(Ds, Dr) * 2 * logd)))
        ne = len(sl_g)
        npad_e = -(-ne // B) * B
        ru = np.full(npad_e, len(mats[cs]) - 1, np.int64)   # dummy row
        rv = np.full(npad_e, len(mats[cr]) - 1, np.int64)
        vg = np.full(npad_e, n, np.int64)                   # dummy vertex
        ru[:ne] = row_in_cls[sl_g]
        rv[:ne] = row_in_cls[rl_g]
        vg[:ne] = rl_g
        groups.append(dict(
            cs=cs, cr=cr, B=B, vg=vg,
            ru=ru.reshape(-1, B).astype(np.int32),
            rv=rv.reshape(-1, B).astype(np.int32)))
    return mats, groups, len(s_s)


def count_triangles_bucketed(src0, dst0, n, n_pad=None):
    """Exact triangle counts from a 0-based edge list (any orientation,
    duplicates tolerated).  Returns ``(per_vertex[n_pad] int32, total)``;
    per-vertex counts attribute each triangle to its degree-middle vertex
    (see module docstring).
    """
    if n_pad is None:
        n_pad = n
    mats_np, groups, _ = _prep(src0, dst0, n)
    mats = [jnp.asarray(m) for m in mats_np]
    nacc = max(n_pad, n) + 1   # bin n holds the batch-pad dummies (all 0)
    gargs = [(mats[g["cs"]], mats[g["cr"]],
              jnp.asarray(g["ru"]), jnp.asarray(g["rv"])) for g in groups]

    # The per-vertex reduction happens ON DEVICE — pulling the [m]
    # per-edge counts to host costs m*4 bytes of device->host traffic
    # where the [n] result is 16-64x smaller.  A scatter-add over n is
    # the one op TPUs serialize, so the reduction is sort-free: the edge
    # order is static per graph, so the host precomputes the receiver
    # sort permutation and segment boundaries once, and the device does
    # gather + cumsum + boundary-diff (all vectorized).
    vg_all = np.concatenate([g["vg"] for g in groups]) if groups else \
        np.zeros(0, np.int64)
    order = np.argsort(vg_all, kind="stable").astype(np.int32)
    bnd = np.searchsorted(vg_all[order],
                          np.arange(nacc + 1)).astype(np.int32)
    per_vertex = np.asarray(_count_device(
        tuple(gargs), jnp.asarray(order), jnp.asarray(bnd), nacc))
    # int32 device cumsum wraps mod 2^32; boundary DIFFERENCES stay
    # exact while each per-vertex count < 2^31, but the TOTAL can pass
    # 2^31 on clustered graphs — sum in int64 on the host
    total = int(per_vertex[:n].astype(np.int64).sum())
    return per_vertex[:n_pad].astype(np.int32), total


_BCAST_MAX = 1 << 24   # Ds*Dr above this switches to binary search
                       # (covers all ladder class pairs: TPU gathers
                       # are ~26 ns/element, dense compares ~free)


@functools.partial(jax.jit, static_argnames=("nacc",))
def _count_device(gargs, order, bnd, nacc):
    """Per-vertex triangle counts (int32[nacc]) from all groups.

    Small class pairs use broadcast equality (XLA fuses the
    ``[B, Da, Db]`` compare into its reduction — pure VPU throughput).
    Large pairs (Ds*Dr > 2^15) search each element of the smaller list in
    the sorted larger one with a *fixed-depth unrolled* binary search —
    2·log2(D) vectorized ``take_along_axis`` gathers per probe column
    instead of D compares (a vmapped ``searchsorted`` would lower to
    serial control flow; the unrolled ladder stays fully vectorized).
    """
    cnts = []
    for (Ns, Nr, ru, rv) in gargs:
        Ds, Dr = Ns.shape[1], Nr.shape[1]

        def body(_, batch, Ns=Ns, Nr=Nr, Ds=Ds, Dr=Dr):
            bu, bv = batch
            a = Ns[bu]                      # [B, Ds]
            b = Nr[bv]                      # [B, Dr]
            if Ds * Dr <= _BCAST_MAX:
                if Ds > Dr:      # broadcast the smaller side innermost
                    a, b = b, a
                eq = a[:, :, None] == b[:, None, :]
                eq &= (a != PAD_ID)[:, :, None]
                cnt = jnp.sum(eq, axis=(1, 2), dtype=jnp.int32)
                return 0, cnt
            if Ds > Dr:                     # probe the smaller list
                a, b = b, a
            D = b.shape[1]
            lo = jnp.zeros(a.shape, jnp.int32)
            hi = jnp.full(a.shape, D, jnp.int32)
            for _step in range(max(D - 1, 1).bit_length()):
                mid = (lo + hi) >> 1
                vm = jnp.take_along_axis(b, jnp.minimum(mid, D - 1),
                                         axis=1)
                right = vm < a
                lo = jnp.where(right, mid + 1, lo)
                hi = jnp.where(right, hi, mid)
            hit = jnp.take_along_axis(b, jnp.minimum(lo, D - 1),
                                      axis=1) == a
            hit &= a != PAD_ID              # pads equal pads; mask them
            return 0, jnp.sum(hit, axis=1, dtype=jnp.int32)

        _, cnt = jax.lax.scan(body, 0, (ru, rv))
        cnts.append(cnt.reshape(-1))
    if not cnts:
        return jnp.zeros(nacc, jnp.int32)
    c = jnp.concatenate(cnts)[order]
    cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(c)])
    return cs[bnd[1:]] - cs[bnd[:-1]]
