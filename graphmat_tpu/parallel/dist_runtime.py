"""The 2D-sharded iteration driver: shard_map + mesh collectives.

TPU-native replacement for the reference's hand-rolled MPI exchange in
``multinode/spmspv.h:41-206`` / ``spmspv3.h:41-267``:

==========================================  ===================================
reference (MPI point-to-point)               here (XLA collectives over ICI)
==========================================  ===================================
column broadcast of x segments               ``all_gather(msg, 'r')``
  (compress → Isend nnz → Isend payload)       (fixed-size, bf16/f32 tiles)
row broadcast of vertexprop (SpMSpV3)        ``all_gather(vp, 'c')``
row reduction of y partials + union_received ``psum_scatter('c')`` for ⊕ = sum,
  (queued buffers, user add_fp)                ``all_to_all('c')`` + local ⊕
                                               for min/max/generic
MPI_Allreduce(LAND) convergence              ``psum`` of changed-count
==========================================  ===================================

The whole per-iteration dataflow — send, gather, ⊗, local segment-⊕,
reduce-scatter, apply, convergence psum, the do_every_iteration hook — is
one ``shard_map``-ped function wrapped in ``lax.while_loop`` /
``fori_loop``, so a full multi-device run is a single XLA program.

On TPU, programs that declare a :class:`PallasSemiring` run each tile's
local multiply through the Pallas SpMV kernel (per-tile edge plans from
``DistGraph.pallas_tile_plans``); the mesh collectives are identical.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, tree_util
from jax.sharding import PartitionSpec as P

from ..core.program import GraphProgram, IterationContext, PallasSemiring
from ..core.runtime import PALLAS_BIG
from ..core.types import Activity, Direction, Monoid, UNTIL_CONVERGENCE
from ..ops.segment import (masked_fill_identity, segment_any,
                           segment_reduce_tree)
from .dist_graph import DistEdgeTiles, DistGraph
from .mesh import COL_AXIS, ROW_AXIS

__all__ = ["DistEngine", "run_graph_program_dist"]


def _direction_receivers(order: Direction):
    if order == Direction.OUT_EDGES:
        return ("dst",)
    if order == Direction.IN_EDGES:
        return ("src",)
    return ("dst", "src")


def _where_tree(mask, new_tree, old_tree):
    def one(new, old):
        m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
        return jnp.where(m, new, old)
    return tree_util.tree_map(one, new_tree, old_tree)


def _combine_tree(monoid, a, b):
    if isinstance(monoid, Monoid):
        return tree_util.tree_map(monoid.combine, a, b)
    return tree_util.tree_map(lambda m, x, y: m.combine(x, y), monoid, a, b)


def _reduce_scatter_monoid(monoid, tree, axis, num_chunks):
    """Reduce partials across ``axis`` and keep this device's chunk.

    ⊕ = sum rides the wire-efficient ``psum_scatter``; other monoids do an
    ``all_to_all`` exchange (same bytes on the wire) and combine locally —
    the analog of the reference's ``union_received`` with a user add_fp
    (``DenseSegment.h:808-830``).
    """
    def one(m: Monoid, leaf):
        if m.kind == "sum":
            return lax.psum_scatter(leaf, axis, scatter_dimension=0,
                                    tiled=True)
        exchanged = lax.all_to_all(leaf, axis, split_axis=0, concat_axis=0,
                                   tiled=True)
        chunks = exchanged.reshape((num_chunks, -1) + leaf.shape[1:])
        out = chunks[0]
        for i in range(1, num_chunks):
            out = m.combine(out, chunks[i])
        return out

    if isinstance(monoid, Monoid):
        return tree_util.tree_map(lambda leaf: one(monoid, leaf), tree)
    return tree_util.tree_map(one, monoid, tree)


def _reduce_scatter_f32(kind, leaf, axis, num_chunks):
    if kind == "sum":
        return lax.psum_scatter(leaf, axis, scatter_dimension=0, tiled=True)
    exchanged = lax.all_to_all(leaf, axis, split_axis=0, concat_axis=0,
                               tiled=True)
    chunks = exchanged.reshape((num_chunks, -1) + leaf.shape[1:])
    out = chunks[0]
    op = jnp.minimum if kind == "min" else jnp.maximum
    for i in range(1, num_chunks):
        out = op(out, chunks[i])
    return out


class DistEngine:
    """Compiled 2D-sharded executor for one (program, DistGraph) pair."""

    def __init__(self, program: GraphProgram, graph: DistGraph,
                 use_pallas: Optional[bool] = None):
        self.program = program
        self.graph = graph
        mesh = graph.mesh
        R, C, S = graph.R, graph.C, graph.S
        self.ctx = IterationContext(
            psum=lambda t: lax.psum(t, (ROW_AXIS, COL_AXIS)))

        from ..core.runtime import (_normalize_pallas_semiring,
                                    warn_slow_path)
        semiring = _normalize_pallas_semiring(program.pallas_semiring())
        vec2_semiring = program.pallas_vec2_semiring()
        vec_semiring = program.pallas_vec_semiring()
        if getattr(program, "vector_message", False):
            # concat-reduce runs the XLA path (static-width scatter)
            semiring = vec_semiring = vec2_semiring = None
            use_pallas = False
        if (vec2_semiring is not None
                and program.activity != Activity.ALL_VERTICES):
            vec2_semiring = None
        self.use_pallas_vec2 = False
        self.use_pallas_vec = False
        if use_pallas is None:
            on_tpu = jax.default_backend() == "tpu"
            if on_tpu and vec2_semiring is not None:
                use_pallas = True
                self.use_pallas_vec2 = True
            elif on_tpu and vec_semiring is not None:
                # v1 vec fallback: ACTIVE_ONLY vector programs (vec2
                # needs ALL_VERTICES; any K now runs vec2 via planes)
                use_pallas = True
                self.use_pallas_vec = True
            else:
                use_pallas = (on_tpu and semiring is not None
                              and not program.process_requires_vertexprop)
        elif use_pallas and vec2_semiring is not None:
            self.use_pallas_vec2 = True
        elif use_pallas and vec_semiring is not None and semiring is None:
            self.use_pallas_vec = True
        if use_pallas and semiring is None and vec_semiring is None \
                and vec2_semiring is None:
            raise ValueError("use_pallas=True but no pallas semiring")
        if not use_pallas:
            warn_slow_path(program, "DistEngine")
        self.use_pallas = bool(use_pallas)
        self._semiring = semiring
        self._vec_semiring = vec_semiring
        self._vec2_semiring = vec2_semiring
        # Scalar ⊕ programs run the v2u unified kernel per tile (version
        # 3, same as Engine); GRAPHMAT_KERNEL=v2 restores the round-1
        # split kernels.
        from ..core.runtime import legacy_kernel_env
        legacy = legacy_kernel_env()
        self.pallas_version = 1
        if self.use_pallas and not self.use_pallas_vec and (
                semiring is not None or self.use_pallas_vec2):
            self.pallas_version = 2
            if semiring is not None and not self.use_pallas_vec2 \
                    and not legacy:
                self.pallas_version = 3
        self._pplans = {}
        if self.use_pallas:
            for recv in _direction_receivers(program.order):
                if self.use_pallas_vec2:
                    self._pplans[recv] = graph.pallas_tile_plans_vec2(recv)
                elif self.pallas_version == 3:
                    self._pplans[recv] = graph.pallas_tile_plans2u(recv)
                elif self.pallas_version != 2:
                    self._pplans[recv] = graph.pallas_tile_plans(recv)
                elif semiring.reduce_kind == "sum":
                    self._pplans[recv] = graph.pallas_tile_plans2(recv)
                else:
                    self._pplans[recv] = graph.pallas_tile_plans2m(recv)

        tiles = {}
        if not self.use_pallas:
            tiles = {r: graph.tiles_for(r)
                     for r in _direction_receivers(program.order)}
        n_row_local = C * S  # receivers per row block
        # concat-reduce widths: same static width on every device, so the
        # per-tile width is the max over ALL tiles
        self._msg_width = {}
        if getattr(program, "vector_message", False):
            for recv in _direction_receivers(program.order):
                if program.max_message_width:
                    w = program.max_message_width
                else:
                    w = 1
                    for (_s, r_loc, _v) in graph._host_tiles[recv]:
                        if len(r_loc):
                            w = max(w, int(np.bincount(r_loc).max()))
                self._msg_width[recv] = w

        def xla_partials(state, vp_row, msg_col, sent_col, structure):
            prog = self.program
            vecmsg = getattr(prog, "vector_message", False)
            reduced = None
            got = None
            for recv in _direction_receivers(prog.order):
                ea: DistEdgeTiles = structure["tiles"][recv]
                senders = ea.senders[0]
                receivers = ea.receivers[0]
                vals = ea.vals[0]
                valid = ea.valid[0]
                x_e = tree_util.tree_map(lambda a: a[senders], msg_col)
                e_ok = sent_col[senders] & valid
                vp_r = None
                if prog.process_requires_vertexprop:
                    vp_r = tree_util.tree_map(lambda a: a[receivers], vp_row)
                u_e = prog.process_message(state, x_e, vals, vp_r)
                if vecmsg:
                    from ..ops.segment import segment_concat_tree
                    partial = segment_concat_tree(
                        u_e, e_ok, receivers, n_row_local,
                        self._msg_width[recv], prog.vector_pad)
                else:
                    u_e = masked_fill_identity(prog.reduce, u_e, e_ok)
                    partial = segment_reduce_tree(prog.reduce, u_e,
                                                  receivers, n_row_local)
                g = segment_any(e_ok, receivers, n_row_local)
                if reduced is None:
                    reduced, got = partial, g
                elif vecmsg:
                    reduced = tree_util.tree_map(
                        lambda a, b: jnp.concatenate([a, b], axis=1),
                        reduced, partial)
                    got = got | g
                else:
                    reduced = _combine_tree(prog.reduce, reduced, partial)
                    got = got | g
            if vecmsg:
                # CONCAT across the column axis = the SERIALIZED wire
                # format's list merge (DenseSegment.h:808-830): one
                # all_to_all splits rows back to their owners while
                # concatenating each receiver's per-shard lists
                reduced = tree_util.tree_map(
                    lambda leaf: lax.all_to_all(
                        leaf, COL_AXIS, split_axis=0, concat_axis=1,
                        tiled=True), reduced)
            else:
                # fold partials across the column axis; keep this segment
                reduced = _reduce_scatter_monoid(prog.reduce, reduced,
                                                 COL_AXIS, C)
            got = lax.psum_scatter(got.astype(jnp.int32), COL_AXIS,
                                   scatter_dimension=0, tiled=True) > 0
            return reduced, got

        def pallas_partials(state, msg, sent, structure, recv_final=None):
            """Local tile multiply via the Pallas kernel + mesh reduce.

            ``recv_final`` is the program's exact receiver-finality mask
            over the LOCAL vp shard (see GraphProgram.receiver_final);
            one COL all_gather extends it to the tile's row block, and
            the v2u sparse path then skips chunks whose receiver block
            is entirely final — identical gating on every device of a
            mesh row, so the column-fold partials stay consistent."""
            from ..ops.pallas_spmv import _identity_process, _spmv_call
            from ..ops.pallas_spmv2 import _spmv2_call, _spmv2m_call
            from ..ops.pallas_spmv2u import _spmv2u_call
            v3 = self.pallas_version == 3
            v2 = self.pallas_version == 2 or v3
            prog = self.program
            sem: PallasSemiring = self._semiring
            kind = sem.reduce_kind
            interpret = jax.default_backend() != "tpu"
            dense = prog.activity == Activity.ALL_VERTICES

            x = sem.encode(msg).astype(jnp.float32)  # [S]
            want_got = v2 and kind == "sum" and not dense
            if kind == "sum":
                x = jnp.where(sent, x, 0.0)
                if want_got:
                    # frontier bit rides x's low mantissa bit through the
                    # all_gather; the kernel strips it before ⊗ and returns
                    # per-receiver counts in the same launch — no second
                    # SpMV for the y bitvector
                    from ..ops.pallas_spmv2 import encode_sent_bit
                    x = encode_sent_bit(x, sent)
            else:
                fill = jnp.float32(PALLAS_BIG if kind == "min"
                                   else -PALLAS_BIG)
                x = jnp.where(sent, x, fill)
                x = jnp.clip(x, -PALLAS_BIG, PALLAS_BIG)
            x_col = lax.all_gather(x, ROW_AXIS, tiled=True)       # [R*S]
            sent_bool_col = None
            if not dense:
                # frontier mask for per-tile chunk skipping (v2 kernels)
                sent_bool_col = lax.all_gather(sent, ROW_AXIS, tiled=True)
            recv_final_row = None
            if v3 and not dense and recv_final is not None:
                recv_final_row = lax.all_gather(recv_final, COL_AXIS,
                                                tiled=True)   # [C*S]

            y = None
            gotf = None
            for recv in _direction_receivers(prog.order):
                (arrays, got_static) = structure["pplans"][recv]
                static, n_send_pad = self._pplan_static_for(recv)
                local = tuple(a[0] for a in arrays)
                if v2 and not sem.uses_edge_value:
                    # skip the val stream (slot 4 in the v2u layout; the
                    # legacy v2/v2m stacks still keep val last)
                    vi = 4 if v3 else len(local) - 1
                    local = local[:vi] + (None,) + local[vi + 1:]
                sent_arg = None
                if v2 and sent_bool_col is not None:
                    sent_arg = sent_bool_col
                    if sent_arg.shape[0] < n_send_pad:
                        sent_arg = jnp.pad(
                            sent_arg, (0, n_send_pad - sent_arg.shape[0]))
                    sent_arg = sent_arg[:n_send_pad]

                def call(xin, kd, proc):
                    xp = xin
                    if xp.shape[0] < n_send_pad:
                        xp = jnp.pad(xp, (0, n_send_pad - xp.shape[0]))
                    if v3:
                        return _spmv2u_call(local, static,
                                            xp[:n_send_pad], kd, proc,
                                            interpret, sent=sent_arg,
                                            want_got=want_got,
                                            recv_final=(recv_final_row
                                                        if sent_arg
                                                        is not None
                                                        else None))
                    if v2 and kd == "sum":
                        ns = getattr(sem, "n_splits", 3)
                        return _spmv2_call(local, static, xp[:n_send_pad],
                                           proc, ns, interpret,
                                           sent=sent_arg,
                                           want_got=want_got)
                    if v2:
                        return _spmv2m_call(local, static, xp[:n_send_pad],
                                            kd, proc, interpret,
                                            sent=sent_arg)
                    return _spmv_call(local, static, xp[:n_send_pad], kd,
                                      proc, interpret)

                if want_got:
                    y_dir, cnt = call(x_col, kind, sem.process)
                    y_dir = y_dir[:n_row_local]
                    g_dir = cnt[:n_row_local]
                else:
                    y_dir = call(x_col, kind, sem.process)[:n_row_local]
                if want_got:
                    pass
                elif kind == "sum":
                    if dense:
                        g_dir = got_static[0][:n_row_local].astype(
                            jnp.float32)
                    else:
                        g_dir = call(
                            lax.all_gather(
                                jnp.where(sent, 1.0, 0.0).astype(
                                    jnp.float32), ROW_AXIS, tiled=True),
                            "sum", _identity_process)[:n_row_local]
                elif kind == "min":
                    g_dir = (y_dir < PALLAS_BIG / 2).astype(jnp.float32)
                else:
                    g_dir = (y_dir > -PALLAS_BIG / 2).astype(jnp.float32)
                if y is None:
                    y, gotf = y_dir, g_dir
                else:
                    y = (y + y_dir if kind == "sum" else
                         (jnp.minimum(y, y_dir) if kind == "min"
                          else jnp.maximum(y, y_dir)))
                    gotf = gotf + g_dir

            y = _reduce_scatter_f32(kind, y, COL_AXIS, C)          # [S]
            got = lax.psum_scatter(gotf, COL_AXIS, scatter_dimension=0,
                                   tiled=True) > 0
            if kind == "min":
                y = jnp.where(y < PALLAS_BIG / 2, y, jnp.inf)
            elif kind == "max":
                y = jnp.where(y > -PALLAS_BIG / 2, y, -jnp.inf)
            reduced = sem.decode(y)
            return reduced, got

        def vec_partials(state, msg, sent, vp, structure):
            """K-wide v1 vec path on the mesh (SpMSpV3 class) — serves
            K > 32 and ACTIVE_ONLY vector programs the vec2 layout cannot
            (the reference's multinode SpMSpV3, spmspv3.h:41-267)."""
            from ..ops.pallas_spmv import _identity_process, _spmv_call
            from ..ops.pallas_spmv_vec import _spmv_vec_call
            prog = self.program
            sem = self._vec_semiring
            interpret = jax.default_backend() != "tpu"
            dense = prog.activity == Activity.ALL_VERTICES

            x = sem.encode(state, msg).astype(jnp.float32)    # [S, K]
            x = jnp.where(sent[:, None], x, 0.0)
            x_col = lax.all_gather(x, ROW_AXIS, tiled=True)   # [R*S, K]
            vp_row = None
            if sem.needs_vp:
                vpe = sem.encode_vp(state, vp).astype(jnp.float32)
                vp_row = lax.all_gather(vpe, COL_AXIS, tiled=True)
            extra = sem.extra_fn(state) if sem.extra_fn is not None \
                else None
            sent_col = None
            if not dense:
                sentf = jnp.where(sent, 1.0, 0.0).astype(jnp.float32)
                sent_col = lax.all_gather(sentf, ROW_AXIS, tiled=True)

            y = None
            gotf = None
            for recv in _direction_receivers(prog.order):
                (arrays, got_static) = structure["pplans"][recv]
                static, n_send_pad = self._pplan_static_for(recv)
                local = tuple(a[0] for a in arrays)
                xp = x_col
                if xp.shape[0] < n_send_pad:
                    xp = jnp.pad(xp, ((0, n_send_pad - xp.shape[0]),
                                      (0, 0)))
                y_dir = _spmv_vec_call(local, static, xp[:n_send_pad],
                                       vp_row, extra, sem.process, sem.k,
                                       sem.x_splits, sem.vp_splits,
                                       interpret)[:n_row_local]
                if dense:
                    g_dir = got_static[0][:n_row_local].astype(jnp.float32)
                else:
                    sp = sent_col
                    if sp.shape[0] < n_send_pad:
                        sp = jnp.pad(sp, (0, n_send_pad - sp.shape[0]))
                    g_dir = _spmv_call(local, static, sp[:n_send_pad],
                                       "sum", _identity_process,
                                       interpret)[:n_row_local]
                if y is None:
                    y, gotf = y_dir, g_dir
                else:
                    y = y + y_dir
                    gotf = gotf + g_dir
            y = lax.psum_scatter(y, COL_AXIS, scatter_dimension=0,
                                 tiled=True)                  # [S, K]
            got = lax.psum_scatter(gotf, COL_AXIS, scatter_dimension=0,
                                   tiled=True) > 0
            return sem.decode(y), got

        def vec2_partials(state, msg, sent, vp, structure):
            """K-wide local tile multiply (vec2 kernel) + mesh reduce.
            K > 32 runs ceil(K/32) stacked planes through one shared
            tile plan (round 5; the dist K>32 route used to fall back
            to the v1 vec kernel)."""
            from ..ops.pallas_spmv_vec2 import (KPAD, _pack_planes,
                                                _spmv_vec2_call)
            prog = self.program
            sem = self._vec2_semiring
            interpret = jax.default_backend() != "tpu"

            x = sem.encode(state, msg).astype(jnp.float32)    # [S, K]
            x = jnp.where(sent[:, None], x, 0.0)
            x_col = lax.all_gather(x, ROW_AXIS, tiled=True)   # [R*S, K]
            vp_row = None
            if sem.needs_vp:
                vpe = sem.encode_vp(state, vp).astype(jnp.float32)
                vp_row = lax.all_gather(vpe, COL_AXIS, tiled=True)
            kb = max(1, -(-x.shape[1] // KPAD),
                     -(-vp_row.shape[1] // KPAD)
                     if vp_row is not None else 1)
            extra = sem.extra_fn(state) if sem.extra_fn is not None \
                else None
            ex = None
            if extra is not None:
                exf = jnp.pad(extra.reshape(-1),
                              (0, kb * KPAD - extra.size))
                ex = jnp.concatenate(
                    [jnp.tile(exf[p * KPAD:(p + 1) * KPAD], 4)
                     for p in range(kb)])

            y = None
            gotf = None
            for recv in _direction_receivers(prog.order):
                (arrays, got_static) = structure["pplans"][recv]
                static, n_send_pad = self._pplan_static_for(recv)
                n_pad_t = static[5]
                local = tuple(a[0] for a in arrays)
                xw = _pack_planes(x_col, n_send_pad, kb)
                vw = (_pack_planes(vp_row, n_pad_t, kb)
                      if vp_row is not None
                      else jnp.zeros(kb * (static[5] // 4) * 128,
                                     jnp.float32))
                y_dir = _spmv_vec2_call(local, static, xw, vw, ex,
                                        sem.process, sem.n_splits,
                                        interpret, ex is not None,
                                        kb=kb)[:n_row_local]
                g_dir = got_static[0][:n_row_local].astype(jnp.float32)
                if y is None:
                    y, gotf = y_dir, g_dir
                else:
                    y = y + y_dir
                    gotf = gotf + g_dir
            y = lax.psum_scatter(y, COL_AXIS, scatter_dimension=0,
                                 tiled=True)                  # [S, 32]
            got = lax.psum_scatter(gotf, COL_AXIS, scatter_dimension=0,
                                   tiled=True) > 0
            return sem.decode(y[:, : max(x.shape[1], 1)]), got

        def local_step(carry, structure):
            """Body on ONE device: local shards + explicit collectives."""
            it, state, vp, active, _conv = carry
            prog = self.program
            valid_vertex = structure["valid_vertex"]  # [S]

            msg, send_mask = prog.send_message(state, vp)
            sent = active & valid_vertex
            if send_mask is not None:
                sent = sent & send_mask

            if self.use_pallas_vec2:
                reduced, got = vec2_partials(state, msg, sent, vp,
                                             structure)
            elif self.use_pallas_vec:
                reduced, got = vec_partials(state, msg, sent, vp,
                                            structure)
            elif self.use_pallas:
                recv_final = None
                if self.pallas_version == 3:
                    recv_final = prog.receiver_final(state, vp, it)
                    if recv_final is not None:
                        recv_final = recv_final | ~valid_vertex
                reduced, got = pallas_partials(state, msg, sent, structure,
                                               recv_final=recv_final)
            else:
                # column broadcast down the row axis
                msg_col, sent_col = lax.all_gather((msg, sent), ROW_AXIS,
                                                   tiled=True)
                vp_row = None
                if prog.process_requires_vertexprop:
                    vp_row = lax.all_gather(vp, COL_AXIS, tiled=True)
                reduced, got = xla_partials(state, vp_row, msg_col,
                                            sent_col, structure)

            applied = prog.apply(state, reduced, vp)
            vp_new = _where_tree(got & valid_vertex, applied, vp)
            ch = prog.changed(vp, vp_new) & got & valid_vertex
            nchanged = lax.psum(jnp.sum(ch.astype(jnp.int32)),
                                (ROW_AXIS, COL_AXIS))
            converged = nchanged == 0

            state = prog.do_every_iteration(state, vp_new, it, self.ctx)

            if prog.activity == Activity.ALL_VERTICES:
                active_new = valid_vertex
            else:
                active_new = ch
            return (it + 1, state, vp_new, active_new, converged)

        tile_spec = DistEdgeTiles(*([P((ROW_AXIS, COL_AXIS))] * 4))
        structure_specs = {
            "valid_vertex": P((ROW_AXIS, COL_AXIS)),
        }
        if self.use_pallas:
            structure_specs["pplans"] = {
                recv: (tuple([P((ROW_AXIS, COL_AXIS))]
                             * len(self._pplans[recv][0])),
                       P((ROW_AXIS, COL_AXIS)))
                for recv in self._pplans}
        else:
            structure_specs["tiles"] = {r: tile_spec for r in tiles}
        vp_spec = P((ROW_AXIS, COL_AXIS))

        def run_fixed(structure, state, vp, active, n_iters):
            def body(_i, carry):
                return local_step(carry, structure)
            carry0 = (jnp.int32(0), state, vp, active, jnp.bool_(False))
            return lax.fori_loop(0, n_iters, body, carry0)

        def run_conv(structure, state, vp, active, max_iters):
            def cond(carry):
                it, _s, _v, _a, converged = carry
                return (~converged) & (it < max_iters)

            def body(carry):
                return local_step(carry, structure)
            carry0 = (jnp.int32(0), state, vp, active, jnp.bool_(False))
            return lax.while_loop(cond, body, carry0)

        def spec_like(tree, spec):
            return tree_util.tree_map(lambda _: spec, tree)

        def shmapped(runner, structure, state, vp, active, extra):
            in_specs = (structure_specs,
                        spec_like(state, P()),
                        spec_like(vp, vp_spec),
                        P((ROW_AXIS, COL_AXIS)),
                        P())
            out_specs = (P(), spec_like(state, P()), spec_like(vp, vp_spec),
                         P((ROW_AXIS, COL_AXIS)), P())
            f = jax.shard_map(runner, mesh=mesh,
                              in_specs=in_specs, out_specs=out_specs,
                              check_vma=False)
            return f(structure, state, vp, active, extra)

        self._run_fixed = jax.jit(
            lambda structure, state, vp, active, n:
            shmapped(lambda s, st, v, a, nn: run_fixed(s, st, v, a, nn),
                     structure, state, vp, active, n),
            static_argnums=(4,))
        self._run_conv = jax.jit(
            lambda structure, state, vp, active, mx:
            shmapped(run_conv, structure, state, vp, active, mx))

        structure = {"valid_vertex": graph.valid_vertex}
        if self.use_pallas:
            structure["pplans"] = {
                recv: (self._pplans[recv][0], self._pplans[recv][2])
                for recv in self._pplans}
        else:
            structure["tiles"] = tiles
        self._structure = structure

    @property
    def vector_reduced_width(self) -> int:
        """Static width of a vector-message program's ``reduced`` rows:
        per-shard widths concat across directions, then across the C
        column shards in the all_to_all merge."""
        return self.graph.C * sum(self._msg_width.values())

    def _pplan_static_for(self, recv):
        entry = self._pplans[recv]
        return entry[1], entry[3]

    def run(self, iterations: int = UNTIL_CONVERGENCE,
            max_iterations: int = 1_000_000, state: Any = None) -> int:
        g = self.graph
        if state is None:
            state = self.program.init_state(g)
        if self.program.activity == Activity.ALL_VERTICES:
            g.set_all_active()
        if iterations is not None and iterations > 0:
            it, state, vp, active, _ = self._run_fixed(
                self._structure, state, g.vp, g.active, int(iterations))
        else:
            it, state, vp, active, _ = self._run_conv(
                self._structure, state, g.vp, g.active,
                jnp.int32(max_iterations))
        g.vp = vp
        g.active = active
        it_val, self.final_state = jax.device_get((it, state))
        return int(it_val)


def run_graph_program_dist(program: GraphProgram, graph: DistGraph,
                           iterations: int = UNTIL_CONVERGENCE,
                           engine: Optional[DistEngine] = None,
                           max_iterations: int = 1_000_000) -> int:
    if engine is None:
        engine = DistEngine(program, graph)
    return engine.run(iterations=iterations, max_iterations=max_iterations)
