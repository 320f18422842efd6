"""Scalable exact triangle counting (degree-oriented, core-bitmap split).

The engine path (``apps.triangle_counting``) mirrors the reference
program structure (``src/TriangleCounting.cpp:80-156``) but materializes
a ``[n, max_degree]`` neighbor matrix — fine for fixtures, infeasible
for power-law graphs at scale.  This module is the TPU-native scalable
path.  v2 (round 5) replaces the all-pairs broadcast-compare with a
two-part split that cuts RMAT-20 device compare work ~40x:

* **Degree orientation**: each undirected edge {u, v} is oriented toward
  the (degree, id)-larger endpoint, which bounds every out-degree by
  O(sqrt(m)).  Total triangles are orientation-invariant:
  Σ_{(u,v) oriented} |N⁺(u) ∩ N⁺(v)| counts each triangle exactly once.

* **Core bitmaps (part 1)**: vertices are ranked by (degree, id); the
  top ``h`` ranks form the *core*.  Orientation closure means a core
  vertex's out-neighbors are all core, so every hub-hub intersection —
  the dominant cost on clustered graphs — lives entirely in core-rank
  space.  Each vertex's core out-neighborhood is a packed ``h``-bit
  row of a uint32 bitmap (compressed to vertices that have core
  neighbors); the device counts |N⁺(u)∩N⁺(v)∩C| for ALL m edges with
  row gathers + AND + popcount — ~m·h/32 word ops total, independent
  of the degree distribution.

* **Tail lists (part 2)**: out-neighbors below the core threshold form
  short per-sender lists (length < deg of the h-th ranked vertex);
  |N⁺(u)∩N⁺(v)∩T| runs through the degree-bucketed broadcast-equality
  kernel, whose cost is now bounded by the small tail classes.  Edges
  whose sender or receiver has no tail neighbors are skipped outright
  (every core vertex is — closure again).

Two implementations of the prep pipeline:

* ``impl='device'`` (default) — the WHOLE prep runs on the TPU: dedup,
  degree ranks, orientation, tallies, bitmap build, tail-list packing
  are XLA sorts/scatters/gathers (a 16M-key device sort measures 0.06 s
  where the 2-core host's parallel sort takes ~2 s, and the axon tunnel
  moves only the raw edge pairs).  The host's only job is to fetch a
  ~500-int stats vector between two jits and fix the static group
  shapes.  "Removed" edges (self loops, duplicates) are sentinelized,
  never compacted, so every shape stays static.
* ``impl='host'`` — native C++/OpenMP prep (``native/planner.cpp::
  gm_tc_create``) with a vectorized numpy fallback; ships the packed
  bitmap + lists to the device.  Kept as the measured fallback and as
  an independent oracle for the device prep.

Per-vertex counts attribute each triangle to its **degree-minimum**
vertex (the oriented sender); the engine path attributes at the
id-middle vertex — per-vertex attributions differ, totals match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import PAD_ID

__all__ = ["count_triangles_bucketed"]

CORE_H = 4096        # core size (bitmap = CORE_H/32 uint32 words/vertex)
_PART1_B = 1 << 18   # edges per part-1 gather batch
_BCAST_MAX = 1 << 24  # Ds*Dr per broadcast slab; larger pairs chunk Dr


def _pow2ceil(x):
    return 1 << max(int(x) - 1, 0).bit_length()


def _tc_prep_native(src0, dst0, n, h, assume_canonical):
    from ..native import load_planner
    lib = load_planner()
    if lib is None or not hasattr(lib, "gm_tc_create") or not len(src0):
        return None
    import ctypes
    u = np.ascontiguousarray(src0, np.int32)
    v = np.ascontiguousarray(dst0, np.int32)
    m_out = ctypes.c_int64()
    m2_out = ctypes.c_int64()
    ncr_out = ctypes.c_int32()
    hd = lib.gm_tc_create(u, v, len(u), n, h,
                          1 if assume_canonical else 0,
                          ctypes.byref(m_out), ctypes.byref(m2_out),
                          ctypes.byref(ncr_out))
    m, m2, ncr = int(m_out.value), int(m2_out.value), int(ncr_out.value)
    h_eff = min(h, n)
    W = (h_eff + 31) // 32
    try:
        s_all = np.empty(m, np.int32)
        r_all = np.empty(m, np.int32)
        iu_row = np.empty(m, np.int32)
        iv_row = np.empty(m, np.int32)
        bitmap = np.zeros((ncr + 1, W), np.uint32)
        s2 = np.empty(m2, np.int32)
        r2 = np.empty(m2, np.int32)
        t2rank = np.empty(m2, np.int32)
        t_of = np.empty(n, np.int32)
        odeg = np.empty(n, np.int32)
        lib.gm_tc_fill(hd, s_all, r_all, iu_row, iv_row,
                       bitmap.reshape(-1), s2, r2, t2rank, t_of, odeg)
    finally:
        lib.gm_tc_destroy(hd)
    return dict(m=m, s_all=s_all, r_all=r_all, iu_row=iu_row,
                iv_row=iv_row, bitmap=bitmap, s2=s2, r2=r2,
                t2rank=t2rank, t_of=t_of, odeg=odeg, ncr=ncr, W=W)


def _tc_prep_numpy(src0, dst0, n, h, assume_canonical):
    """Vectorized numpy fallback with identical outputs."""
    u = np.asarray(src0, np.int64)
    v = np.asarray(dst0, np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    key = np.minimum(u, v) * np.int64(n) + np.maximum(u, v)
    if not assume_canonical:
        key = np.sort(key)
        if len(key):
            key = key[np.r_[True, key[1:] != key[:-1]]]
    a, b = key // n, key % n
    deg = (np.bincount(a, minlength=n)
           + np.bincount(b, minlength=n)).astype(np.int64)
    order = np.lexsort((np.arange(n), deg))
    rank_of = np.empty(n, np.int64)
    rank_of[order] = np.arange(n)
    fwd = rank_of[a] < rank_of[b]
    s = np.where(fwd, a, b)
    r = np.where(fwd, b, a)
    so = np.argsort(s, kind="stable")
    s, r = s[so], r[so]
    m = len(s)
    odeg = np.bincount(s, minlength=n).astype(np.int32)
    off = np.concatenate([[0], np.cumsum(odeg, dtype=np.int64)])

    h_eff = min(h, n)
    core_lo = n - h_eff
    W = (h_eff + 31) // 32
    rk = rank_of[r]
    is_core = rk >= core_lo
    t_of = np.bincount(s[~is_core], minlength=n).astype(np.int32)
    core_cnt = odeg - t_of
    crow = np.full(n, -1, np.int64)
    has_core = np.flatnonzero(core_cnt > 0)
    crow[has_core] = np.arange(len(has_core))
    ncr = len(has_core)

    bitmap = np.zeros((ncr + 1) * W, np.uint32)
    bit = (rk[is_core] - core_lo).astype(np.int64)
    word = crow[s[is_core]] * W + (bit >> 5)
    np.bitwise_or.at(bitmap, word, np.uint32(1) << (bit & 31).astype(
        np.uint32))
    bitmap = bitmap.reshape(ncr + 1, W)

    iu_row = np.where(crow[s] < 0, ncr, crow[s]).astype(np.int32)
    iv_row = np.where(crow[r] < 0, ncr, crow[r]).astype(np.int32)
    s2 = s[~is_core].astype(np.int32)
    r2 = r[~is_core].astype(np.int32)
    t2off = np.concatenate([[0], np.cumsum(t_of, dtype=np.int64)])
    t2rank = (np.arange(len(s2)) - t2off[s2]).astype(np.int32)
    return dict(m=m, s_all=s.astype(np.int32), r_all=r.astype(np.int32),
                iu_row=iu_row, iv_row=iv_row, bitmap=bitmap, s2=s2,
                r2=r2, t2rank=t2rank, t_of=t_of,
                odeg=odeg, ncr=ncr, W=W)


def _prep(src0, dst0, n, h=None, assume_canonical=False):
    """Host prep.  Returns (device_args, aux) where ``device_args`` feed
    ``_count_device`` and ``aux`` carries host metadata."""
    if h is None:
        h = CORE_H
    d = _tc_prep_native(src0, dst0, n, h, assume_canonical)
    if d is None:
        d = _tc_prep_numpy(src0, dst0, n, h, assume_canonical)
    m = d["m"]

    # part-1 batches (pad tail with the zero bitmap row)
    B = max(128, min(_PART1_B, _pow2ceil(max(m, 1))))
    nb = max(1, -(-m // B))
    iu = np.full(nb * B, d["ncr"], np.int32)
    iv = np.full(nb * B, d["ncr"], np.int32)
    iu[:m] = d["iu_row"]
    iv[:m] = d["iv_row"]
    off = np.concatenate([[0], np.cumsum(d["odeg"], dtype=np.int64)])

    # part-2 probe edges: both endpoints must own a tail list
    t_of = d["t_of"]
    s2, r2 = d["s2"], d["r2"]
    probe = t_of[r2] > 0           # t_of[s2] > 0 by construction
    sp, rp = s2[probe], r2[probe]

    # tail-class mats: one compact [rows_c, D_c] list matrix per class
    tmax = int(t_of.max()) if n else 0
    ladder = [c for c in (16, 64, 256, 1024, 4096) if c < tmax]
    ladder = sorted(set(ladder + ([_pow2ceil(tmax)] if tmax else [])))
    mats = []
    row_in_cls = np.full(n, -1, np.int64)
    if tmax:
        cls_of = np.searchsorted(ladder, np.maximum(t_of, 1))
        cls_edge = cls_of[s2]
        for ci, D in enumerate(ladder):
            vs = np.flatnonzero((cls_of == ci) & (t_of > 0))
            row_in_cls[vs] = np.arange(len(vs))
            mat = np.full((max(len(vs), 1) + 1, D), PAD_ID, np.int32)
            if len(vs):
                em = cls_edge == ci
                mat[row_in_cls[s2[em]], d["t2rank"][em]] = r2[em]
            mats.append(mat)

    groups = []
    if len(sp):
        cls_s = cls_of[sp]
        cls_r = cls_of[rp]
        gkey = cls_s * len(ladder) + cls_r
        for gk in np.flatnonzero(np.bincount(gkey,
                                             minlength=len(ladder) ** 2)):
            sel = np.flatnonzero(gkey == gk)
            cs, cr = divmod(int(gk), len(ladder))
            Ds, Dr = ladder[cs], ladder[cr]
            Bg = max(8, min(1 << 16,
                            (1 << 30) // (Ds * min(Dr, 4096))) // 8 * 8)
            ne = len(sel)
            npad_e = -(-ne // Bg) * Bg
            ru = np.full(npad_e, len(mats[cs]) - 1, np.int64)
            rv = np.full(npad_e, len(mats[cr]) - 1, np.int64)
            vg = np.full(npad_e, n, np.int64)       # dummy -> bin n
            ru[:ne] = row_in_cls[sp[sel]]
            rv[:ne] = row_in_cls[rp[sel]]
            vg[:ne] = sp[sel]                       # attribute to sender
            groups.append(dict(
                cs=cs, cr=cr, vg=vg.astype(np.int32),
                ru=ru.reshape(-1, Bg).astype(np.int32),
                rv=rv.reshape(-1, Bg).astype(np.int32)))
    dev = dict(bitmap=d["bitmap"], iu=iu.reshape(nb, B),
               iv=iv.reshape(nb, B), off=off.astype(np.int64),
               mats=mats, groups=groups)
    aux = dict(m=m, ncr=d["ncr"], W=d["W"], odeg=d["odeg"], t_of=t_of,
               n_groups=len(groups))
    return dev, aux


@functools.partial(jax.jit, static_argnames=("nacc", "n"))
def _count_device(bm, iu, iv, off, gargs, vgs, nacc, n):
    """Per-vertex triangle counts (int32[nacc]) plus exact-total partial
    sums.  Part 1: bitmap AND + popcount over gathered rows.  Part 2:
    broadcast equality per tail class-pair (Dr chunked at 4096 so the
    compare slab stays < 2^30).  int32 cumsum wraps mod 2^32; the CSR
    boundary DIFFERENCES stay exact while each per-vertex count < 2^31.
    The total is returned as (hi, lo) 512-wide partial sums so the host
    can fold it in int64 without a [n]-sized D2H fetch."""
    def p1(carry, batch):
        a = bm[batch[0]]
        b = bm[batch[1]]
        cnt = jnp.sum(jax.lax.population_count(a & b).astype(jnp.int32),
                      axis=1)
        return carry, cnt
    _, c1 = jax.lax.scan(p1, jnp.int32(0), (iu, iv))
    c1 = c1.reshape(-1)
    cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(c1)])
    pv = jnp.zeros(nacc, jnp.int32).at[:n].set(cs[off[1:]] - cs[off[:-1]])

    for (Ns, Nr, ru, rv), vg in zip(gargs, vgs):
        Ds, Dr = Ns.shape[1], Nr.shape[1]

        def body(carry, batch, Ns=Ns, Nr=Nr, Ds=Ds, Dr=Dr):
            bu, bv = batch
            a = Ns[bu]                      # [B, Ds]
            b = Nr[bv]                      # [B, Dr]
            if Ds > Dr:      # broadcast the smaller side innermost
                a, b = b, a
                Ds, Dr = Dr, Ds
            cnt = jnp.zeros(a.shape[0], jnp.int32)
            av = (a != PAD_ID)[:, :, None]
            for c0 in range(0, Dr, 4096):   # chunk huge receiver lists
                bc = b[:, c0:c0 + 4096]
                eq = (a[:, :, None] == bc[:, None, :]) & av
                cnt = cnt + jnp.sum(eq, axis=(1, 2), dtype=jnp.int32)
            return carry, cnt
        _, c2 = jax.lax.scan(body, jnp.int32(0), (ru, rv))
        pv = pv.at[vg].add(c2.reshape(-1))

    pvp = jnp.pad(pv, (0, (-len(pv)) % 512))
    hi = jnp.sum((pvp >> 16).reshape(-1, 512), axis=1)
    lo = jnp.sum((pvp & 0xFFFF).reshape(-1, 512), axis=1)
    return pv, hi, lo


# ---------------------------------------------------------------------
# Fully on-device prep (impl='device').  Static pad-class ladder: every
# graph shares it, so only the per-graph group SIZES are dynamic (one
# small stats fetch between the two jits).
# ---------------------------------------------------------------------

_NC = 21
_LADDER = tuple(8 << i for i in range(_NC))     # 8 .. 2^23


@functools.partial(jax.jit, static_argnames=("n", "h", "canonical"))
def _tc_stats(uv, n, h, canonical):
    """Jit A: dedup (sentinelized), degree ranks, orientation, per-vertex
    tallies, per-edge plane gathers.  Returns the carried [e] planes plus
    a small stats vector (ncr, rows-per-class, group sizes) the host
    needs to fix jit B's static shapes.  Edges never compact: self
    loops / duplicates become sender-sentinel ``n`` rows that count 0.
    ``uv`` is the raw edge array in ONE H2D transfer: [5, e] uint8
    byte planes (2 per endpoint + a shared hi-nibble plane) when
    n <= 2^20, [6, e] (3 per endpoint) when n <= 2^24 — the upload is
    the dominant tunnel cost of a cold count — else [2, e] int32."""
    i32 = jnp.int32
    if uv.dtype == jnp.uint8 and uv.shape[0] == 5:
        b = uv.astype(i32)
        u = b[0] | (b[1] << 8) | ((b[4] & 15) << 16)
        v = b[2] | (b[3] << 8) | ((b[4] >> 4) << 16)
    elif uv.dtype == jnp.uint8:
        b = uv.astype(i32)
        u = b[0] | (b[1] << 8) | (b[2] << 16)
        v = b[3] | (b[4] << 8) | (b[5] << 16)
    else:
        u, v = uv[0], uv[1]
    h_eff = min(h, n)
    core_lo = n - h_eff
    iota_n = jnp.arange(n, dtype=i32)
    valid = u != v
    a = jnp.where(valid, jnp.minimum(u, v), n).astype(i32)
    b = jnp.where(valid, jnp.maximum(u, v), n).astype(i32)
    if not canonical:
        a, b = jax.lax.sort((a, b), num_keys=2)
        dup = (a == jnp.roll(a, 1)) & (b == jnp.roll(b, 1))
        dup = dup.at[0].set(False)
        a = jnp.where(dup, n, a)
        b = jnp.where(dup, n, b)
    deg = jnp.zeros(n + 1, i32).at[a].add(1).at[b].add(1)
    _, ord_ = jax.lax.sort((deg[:n], iota_n), num_keys=2)
    rank_of = jnp.zeros(n + 1, i32).at[ord_].set(iota_n).at[n].set(n)
    ra = rank_of[a]
    rb = rank_of[b]
    fwd = ra < rb
    s = jnp.where(fwd, a, b)
    r = jnp.where(fwd, b, a)
    rk_r = jnp.where(fwd, rb, ra)
    live = a < n
    is_tail = live & (rk_r < core_lo)
    is_core = live & (rk_r >= core_lo)
    # two 1-D scatters: a single [n+1, 2] scatter with a trailing window
    # dim measures 4x slower on TPU (1.06 s vs 2x0.13 s at 15.7M edges)
    t_of = jnp.zeros(n + 1, i32).at[s].add(is_tail.astype(i32))[:n]
    core_cnt = jnp.zeros(n + 1, i32).at[s].add(is_core.astype(i32))[:n]

    has_core = core_cnt > 0
    crow_v = jnp.where(has_core, jnp.cumsum(has_core.astype(i32)) - 1,
                       jnp.sum(has_core.astype(i32)))
    ncr = jnp.sum(has_core.astype(i32))

    ladder = jnp.asarray(_LADDER, i32)
    cls_of = jnp.minimum(
        jnp.searchsorted(ladder, jnp.maximum(t_of, 1)), _NC - 1
    ).astype(i32)
    has_t = t_of > 0
    rowc = jnp.zeros(_NC, i32).at[cls_of].add(has_t.astype(i32))
    row_in_cls = jnp.zeros(n, i32)
    for c in range(_NC):
        mc = has_t & (cls_of == c)
        row_in_cls = jnp.where(mc, jnp.cumsum(mc.astype(i32)) - 1,
                               row_in_cls)
    sizes_c = jnp.where(rowc > 0, (rowc + 1) * ladder, 0)
    base_c = jnp.concatenate([jnp.zeros(1, i32),
                              jnp.cumsum(sizes_c)])[:-1]
    flatrow_v = base_c[cls_of] + row_in_cls * ladder[cls_of]

    vt = jnp.stack([crow_v, has_t.astype(i32), cls_of, flatrow_v], axis=1)
    sent = jnp.stack([ncr, jnp.int32(0), jnp.int32(0),
                      jnp.int32(0)])[None, :]
    vt = jnp.concatenate([vt, sent], axis=0)       # [n+1, 4]
    gs = vt[s]
    gr = vt[r]
    iu, iv = gs[:, 0], gr[:, 0]
    frs, frr = gs[:, 3], gr[:, 3]
    probe = is_tail & (gs[:, 1] > 0) & (gr[:, 1] > 0)
    gkey = jnp.where(probe, gs[:, 2] * _NC + gr[:, 2],
                     jnp.int32(_NC * _NC))
    gsizes = jnp.zeros(_NC * _NC + 1, i32).at[gkey].add(1)
    stats = jnp.concatenate([jnp.stack([ncr]), rowc, gsizes])
    return s, r, rk_r, iu, iv, gkey, frs, frr, stats


def _group_cfg(stats, h, n):
    """Host side of the A->B seam: static shapes from the stats vector."""
    stats = np.asarray(stats).astype(np.int64)
    ncr = int(stats[0])
    rowc = stats[1:1 + _NC]
    gsizes = stats[1 + _NC:1 + _NC + _NC * _NC]
    sizes_c = np.where(rowc > 0, (rowc + 1) * np.asarray(_LADDER), 0)
    base_c = np.concatenate([[0], np.cumsum(sizes_c)])[:-1]
    bases = tuple((int(base_c[c]), int(rowc[c])) for c in range(_NC))
    mats_size = int(sizes_c.sum())
    groups = []
    off = 0
    for gk in range(_NC * _NC):
        sz = int(gsizes[gk])
        if sz:
            cs, cr = divmod(gk, _NC)
            Ds, Dr = _LADDER[cs], _LADDER[cr]
            Bg = max(8, min(1 << 16,
                            (1 << 30) // (Ds * min(Dr, 4096))) // 8 * 8)
            groups.append((cs, cr, off, sz, Bg, -(-sz // Bg)))
        off += sz
    return ncr, mats_size, bases, tuple(groups)


@functools.partial(jax.jit, static_argnames=(
    "n", "h", "ncr", "nacc", "mats_size", "bases", "groups"))
def _tc_count(s, r, rk_r, iu, iv, gkey, frs, frr,
              n, h, ncr, nacc, mats_size, bases, groups):
    """Jit B (static shapes fixed): bitmap scatter-build, part-1 popcount
    scan, tail-list scatter-build, part-2 broadcast groups, per-vertex
    attribution, and hi/lo total partials."""
    i32 = jnp.int32
    e = s.shape[0]
    h_eff = min(h, n)
    core_lo = n - h_eff
    W = (h_eff + 31) // 32
    live = s < n
    is_core = live & (rk_r >= core_lo)
    bit = jnp.where(is_core, rk_r - core_lo, 0)
    word = jnp.where(is_core, iu * W + (bit >> 5), ncr * W)
    bitv = jnp.where(is_core,
                     jnp.left_shift(jnp.int32(1), bit & 31), 0)
    bm = jnp.zeros((ncr + 1) * W, i32).at[word].add(bitv)
    bm = jax.lax.bitcast_convert_type(bm, jnp.uint32).reshape(ncr + 1, W)

    # part 1: popcount over gathered bitmap rows
    B1 = max(128, min(_PART1_B, _pow2ceil(max(e, 1))))
    nb = max(1, -(-e // B1))
    pad1 = nb * B1 - e
    iu_p = jnp.concatenate([iu, jnp.full(pad1, ncr, i32)]).reshape(nb, B1)
    iv_p = jnp.concatenate([iv, jnp.full(pad1, ncr, i32)]).reshape(nb, B1)

    def p1(carry, batch):
        av = bm[batch[0]]
        bv = bm[batch[1]]
        cnt = jnp.sum(jax.lax.population_count(av & bv).astype(i32),
                      axis=1)
        return carry, cnt
    _, c1 = jax.lax.scan(p1, jnp.int32(0), (iu_p, iv_p))
    pv = jnp.zeros(nacc, i32).at[s].add(c1.reshape(-1)[:e])

    # part 2: tail-list build (sort by sender flat row; rank via cummax)
    big = jnp.int32(2 ** 31 - 1)
    tailkey = jnp.where(live & (rk_r < core_lo), frs, big)
    tk_s, r_s2 = jax.lax.sort((tailkey, r), num_keys=1)
    iota_e = jnp.arange(e, dtype=i32)
    if e:
        newseg = jnp.concatenate([jnp.ones(1, bool), tk_s[1:] != tk_s[:-1]])
        t2rank = iota_e - jax.lax.cummax(jnp.where(newseg, iota_e, 0))
        midx = jnp.where(tk_s < big, tk_s + t2rank, mats_size)
        mats = jnp.full(mats_size + 1, PAD_ID, i32).at[midx].set(r_s2)
    else:
        mats = jnp.full(mats_size + 1, PAD_ID, i32)

    # probe groups (sorted by gkey; non-probes cluster at the end)
    if groups:
        _, frs_p, frr_p, sp_p = jax.lax.sort((gkey, frs, frr, s),
                                             num_keys=1)
        maxlen = max(g[2] + g[4] * g[5] for g in groups)
        padg = max(0, maxlen - e)
        frs_p = jnp.concatenate([frs_p, jnp.zeros(padg, i32)])
        frr_p = jnp.concatenate([frr_p, jnp.zeros(padg, i32)])
        sp_p = jnp.concatenate([sp_p, jnp.full(padg, n, i32)])
    c2_all, sp_all = [], []
    for (cs, cr, off, sz, Bg, nbg) in groups:
        Ds, Dr = _LADDER[cs], _LADDER[cr]
        base_s, rows_s = bases[cs]
        base_r, rows_r = bases[cr]
        ns = mats[base_s:base_s + (rows_s + 1) * Ds].reshape(-1, Ds)
        nr = mats[base_r:base_r + (rows_r + 1) * Dr].reshape(-1, Dr)
        span = nbg * Bg
        mask = jnp.arange(span, dtype=i32) < sz
        ru = jnp.where(mask, (frs_p[off:off + span] - base_s) // Ds,
                       rows_s).reshape(nbg, Bg)
        rv = jnp.where(mask, (frr_p[off:off + span] - base_r) // Dr,
                       rows_r).reshape(nbg, Bg)
        sp = jnp.where(mask, sp_p[off:off + span], n)

        def body(carry, batch, ns=ns, nr=nr, Ds=Ds, Dr=Dr):
            bu, bv = batch
            av = ns[bu]
            bv_ = nr[bv]
            if Ds > Dr:          # broadcast the smaller side innermost
                av, bv_ = bv_, av
                Ds, Dr = Dr, Ds
            cnt = jnp.zeros(av.shape[0], i32)
            valid = (av != PAD_ID)[:, :, None]
            for c0 in range(0, Dr, 4096):
                bc = bv_[:, c0:c0 + 4096]
                eq = (av[:, :, None] == bc[:, None, :]) & valid
                cnt = cnt + jnp.sum(eq, axis=(1, 2), dtype=i32)
            return carry, cnt
        _, c2 = jax.lax.scan(body, jnp.int32(0), (ru, rv))
        c2_all.append(c2.reshape(-1))
        sp_all.append(sp)
    if c2_all:     # one merged attribution scatter for all groups
        pv = pv.at[jnp.concatenate(sp_all)].add(jnp.concatenate(c2_all))

    pvp = jnp.pad(pv, (0, (-len(pv)) % 512))
    hi = jnp.sum((pvp >> 16).reshape(-1, 512), axis=1)
    lo = jnp.sum((pvp & 0xFFFF).reshape(-1, 512), axis=1)
    return pv, hi, lo


def _count_triangles_devprep(src0, dst0, n, n_pad, h, assume_canonical):
    if h is None:
        h = CORE_H
    nacc = max(n_pad, n) + 1
    if len(src0) == 0:
        return jnp.zeros(n_pad, jnp.int32), 0
    if n <= (1 << 20):
        # 5-byte edge packing: 2 byte planes per endpoint + one shared
        # hi-nibble plane (ids < 2^20) — the upload is the dominant
        # tunnel cost of a cold count, and RMAT-20-class inputs save
        # another 1/6 over the 6-byte layout
        u64 = np.asarray(src0, np.int64)
        v64 = np.asarray(dst0, np.int64)
        uv = np.empty((5, len(src0)), np.uint8)
        uv[0] = u64 & 255
        uv[1] = (u64 >> 8) & 255
        uv[2] = v64 & 255
        uv[3] = (v64 >> 8) & 255
        uv[4] = ((u64 >> 16) & 15) | (((v64 >> 16) & 15) << 4)
    elif n <= (1 << 24):
        # 6-byte edge packing: 3 byte planes per endpoint (ids < 2^24)
        uv = np.empty((6, len(src0)), np.uint8)
        for k, col in ((0, np.asarray(src0, np.int64)),
                       (3, np.asarray(dst0, np.int64))):
            uv[k] = col & 255
            uv[k + 1] = (col >> 8) & 255
            uv[k + 2] = (col >> 16) & 255
    else:
        uv = np.empty((2, len(src0)), np.int32)
        uv[0] = src0
        uv[1] = dst0
    out = _tc_stats(jnp.asarray(uv), n, h, bool(assume_canonical))
    s, r, rk_r, iu, iv, gkey, frs, frr, stats = out
    ncr, mats_size, bases, groups = _group_cfg(stats, h, n)
    pv, hi, lo = _tc_count(s, r, rk_r, iu, iv, gkey, frs, frr,
                           n, h, ncr, nacc, mats_size, bases, groups)
    hi = np.asarray(hi).astype(np.int64)
    lo = np.asarray(lo).astype(np.int64)
    total = int((hi.sum() << 16) + lo.sum())
    return pv[:n_pad], total


def count_triangles_bucketed(src0, dst0, n, n_pad=None, h=None,
                             assume_canonical=False, impl="device"):
    """Exact triangle counts from a 0-based edge list (any orientation;
    duplicates and self loops tolerated unless ``assume_canonical``
    promises unique ``src0 < dst0`` pairs, which skips the dedup sort).
    Returns ``(per_vertex, total)`` — ``per_vertex`` is an int32 DEVICE
    array of length ``n_pad`` attributing each triangle to its
    degree-minimum vertex (see module docstring); ``total`` is an exact
    python int (folded from on-device hi/lo partial sums, so no [n]
    device->host fetch is needed).  ``impl='device'`` (default) runs the
    whole prep on the accelerator; ``impl='host'`` uses the native
    C++/numpy host prep.
    """
    if n_pad is None:
        n_pad = n
    if impl == "device":
        return _count_triangles_devprep(src0, dst0, n, n_pad, h,
                                        assume_canonical)
    dev, _aux = _prep(src0, dst0, n, h=h, assume_canonical=assume_canonical)
    nacc = max(n_pad, n) + 1   # bin n holds the batch-pad dummies (all 0)
    gargs = tuple((jnp.asarray(dev["mats"][g["cs"]]),
                   jnp.asarray(dev["mats"][g["cr"]]),
                   jnp.asarray(g["ru"]), jnp.asarray(g["rv"]))
                  for g in dev["groups"])
    vgs = tuple(jnp.asarray(g["vg"]) for g in dev["groups"])
    pv, hi, lo = _count_device(
        jnp.asarray(dev["bitmap"]), jnp.asarray(dev["iu"]),
        jnp.asarray(dev["iv"]), jnp.asarray(dev["off"]), gargs, vgs,
        nacc, n)
    hi = np.asarray(hi).astype(np.int64)
    lo = np.asarray(lo).astype(np.int64)
    total = int((hi.sum() << 16) + lo.sum())
    return pv[:n_pad], total
