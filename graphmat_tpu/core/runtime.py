"""The iteration driver: ``run_graph_program`` as one compiled XLA loop.

Re-design of ``include/GraphMatRuntime.h:94-279``.  The reference's iteration:

1. clear scratch x/y
2. IntersectReduce(active, vp) -> x        (send_message under bitvector)
3. SpMSpV / SpMTSpV (column-bcast, local multiply, row-reduce over MPI)
4. apply + activity diff (bit-scan loop)
5. MPI_Allreduce(LAND) convergence
6. do_every_iteration

Here the same dataflow is a pure function ``step`` traced once and driven by
``lax.fori_loop`` (fixed iterations) or ``lax.while_loop``
(UNTIL_CONVERGENCE), so the entire run executes on device with zero host
round-trips.  The "network" phases disappear on one chip and become mesh
collectives in :mod:`graphmat_tpu.parallel` on many.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import tree_util


from ..ops.segment import (masked_fill_identity, segment_any,
                           segment_reduce_tree)
from .graph import EdgeArrays, Graph
from .program import (GraphProgram, IterationContext, PallasSemiring,
                      PallasVecSemiring)
from .types import Activity, Direction, UNTIL_CONVERGENCE

_PALLAS_IDENT = {"sum": 0.0, "min": float("inf"), "max": float("-inf")}
# Finite stand-in for ±inf on the kernel's x stream: the bf16 hi/lo split
# turns inf into inf-inf = NaN, so infinities are clamped to ±PALLAS_BIG
# before the kernel and restored after.
PALLAS_BIG = 1e30

__all__ = ["Engine", "engine_for", "run_graph_program",
           "graph_program_init"]


def _normalize_pallas_semiring(sem):
    """Map ⊕ kinds onto the kernel layouts: 'or' rides the max layout
    (encodings must be {0.0, 1.0} floats), 'any' (overwrite-reduce,
    ``src/BFS.cpp:74-76``) rides min — deterministic tie-break, matching
    :data:`types.ANY`.  Unknown kinds fail loudly instead of silently
    dropping to the XLA segment path (reference kernels accept any op_add,
    ``singlenode/spmspv.h:226-314``; here every kind needs a layout)."""
    if sem is None or sem.reduce_kind in ("sum", "min", "max"):
        return sem
    import dataclasses
    if sem.reduce_kind in ("or", "any"):
        return dataclasses.replace(
            sem, reduce_kind="max" if sem.reduce_kind == "or" else "min")
    raise ValueError(
        f"PallasSemiring reduce_kind {sem.reduce_kind!r} has no TPU "
        "kernel layout (supported: sum/min/max/or/any); use a generic "
        "Monoid + the XLA path explicitly with use_pallas=False")


def legacy_kernel_env() -> bool:
    """Parse GRAPHMAT_KERNEL with validation: 'v2u' (default, unified
    routed kernel) or 'v2' (round-1 split v2r/v2m kernels).  Any other
    value raises — a typo must not silently select a kernel."""
    import os
    val = os.environ.get("GRAPHMAT_KERNEL", "v2u")
    if val not in ("v2u", "v2"):
        raise ValueError(
            f"GRAPHMAT_KERNEL={val!r} unrecognized: use 'v2u' (default "
            "unified kernel) or 'v2' (legacy split v2r/v2m kernels)")
    return val == "v2"


def warn_slow_path(program, where: str) -> None:
    """Loud warning when a TPU run drops to the XLA segment-reduce path
    (measured ~10,000x slower than the Pallas kernels — PERF.md).
    Silence with GRAPHMAT_SILENCE_SLOW_PATH=1."""
    import os
    import warnings
    if jax.default_backend() != "tpu":
        return
    if os.environ.get("GRAPHMAT_SILENCE_SLOW_PATH"):
        return
    if getattr(program, "vector_message", False):
        return   # concat-reduce has no kernel by design (one XLA scatter)
    warnings.warn(
        f"{type(program).__name__} runs on the XLA segment-reduce path on "
        f"TPU ({where}): ~10,000x slower than the Pallas kernels.  "
        "Declare pallas_semiring()/pallas_vec_semiring()/"
        "pallas_vec2_semiring() on the program (sum/min/max/or/any all "
        "have kernel layouts), or set GRAPHMAT_SILENCE_SLOW_PATH=1 to "
        "acknowledge.", stacklevel=3)


def engine_for(program, graph, **kw):
    """Engine dispatch by graph type: single-device :class:`Engine` for a
    ``Graph``, :class:`~graphmat_tpu.parallel.dist_runtime.DistEngine`
    for a 2D-sharded ``DistGraph``.  Lets every app runner accept either
    (the reference's binaries are likewise mpirun-agnostic)."""
    from ..parallel.dist_graph import DistGraph
    if isinstance(graph, DistGraph):
        from ..parallel.dist_runtime import DistEngine
        return DistEngine(program, graph, **kw)
    return Engine(program, graph, **kw)


def _direction_receivers(order: Direction):
    if order == Direction.OUT_EDGES:
        return ("dst",)
    if order == Direction.IN_EDGES:
        return ("src",)
    return ("dst", "src")


def _where_tree(mask, new_tree, old_tree):
    def one(new, old):
        if new is old:
            # apply() returned the plane untouched (e.g. BFS's id
            # plane): skip the select — one fewer [n_pad] op per
            # iteration inside the convergence loop
            return old
        m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
        return jnp.where(m, new, old)
    return tree_util.tree_map(one, new_tree, old_tree)


def _combine_tree(monoid, a, b):
    from .types import Monoid
    if isinstance(monoid, Monoid):
        return tree_util.tree_map(monoid.combine, a, b)
    return tree_util.tree_map(lambda m, x, y: m.combine(x, y), monoid, a, b)


class Engine:
    """Compiled executor for one (program, graph-shape) pair.

    The analog of the reference's ``graph_program_init`` scratch structure
    (``GraphMatRuntime.h:60-76``) — here it caches jitted callables instead
    of MPI buffers.  Reuse it across runs (e.g. DeltaStepping re-enters per
    bucket) to avoid recompiles.
    """

    def __init__(self, program: GraphProgram, graph: Graph,
                 ctx: Optional[IterationContext] = None,
                 use_pallas: Optional[bool] = None):
        self.program = program
        self.graph = graph
        self.ctx = ctx if ctx is not None else IterationContext()
        self._n_pad = graph.n_pad

        # ---- Pallas fast-path eligibility ------------------------------
        semiring = _normalize_pallas_semiring(program.pallas_semiring())
        vec_semiring = program.pallas_vec_semiring()
        vec2_semiring = program.pallas_vec2_semiring()
        if getattr(program, "vector_message", False):
            # concat-reduce runs the XLA path (static-width scatter)
            semiring = vec_semiring = vec2_semiring = None
            use_pallas = False
        if (vec2_semiring is not None
                and program.activity != Activity.ALL_VERTICES):
            vec2_semiring = None   # vec2 got comes from static structure
        if vec_semiring is not None and vec2_semiring is None:
            # the v1 vec kernel keeps its whole [h, 2K*128] bf16 operand
            # VMEM-resident (no HBM/DMA path) — beyond the scoped-VMEM
            # budget it is a guaranteed compile-time OOM (measured: 64 MB
            # at 10M edges x K=20, PERF round 5j).  Fall back to the XLA
            # segment path, which is slow but scales.
            xb_bytes = 4 * graph.n_pad * getattr(vec_semiring, "k", 1)
            if xb_bytes > (14 << 20):
                import warnings
                warnings.warn(
                    f"v1 vec kernel operand ({xb_bytes >> 20} MB bf16) "
                    "exceeds the VMEM budget; using the XLA fallback — "
                    "prefer an ALL_VERTICES program with a vec2 semiring "
                    "at this scale")
                vec_semiring = None
        self.use_pallas_vec = False
        self.use_pallas_vec2 = False
        if use_pallas is None:
            on_tpu = jax.default_backend() == "tpu"
            if on_tpu and vec2_semiring is not None:
                use_pallas = True
                self.use_pallas_vec2 = True
            elif on_tpu and vec_semiring is not None:
                use_pallas = True
                self.use_pallas_vec = True
            else:
                use_pallas = (on_tpu and semiring is not None
                              and not program.process_requires_vertexprop)
        elif use_pallas and vec2_semiring is not None:
            self.use_pallas_vec2 = True
        elif use_pallas and vec_semiring is not None:
            self.use_pallas_vec = True
        if use_pallas and semiring is None and vec_semiring is None \
                and vec2_semiring is None:
            raise ValueError("use_pallas=True but program declares no "
                             "pallas semiring")
        if not use_pallas:
            warn_slow_path(program, "Engine")
        self.use_pallas = bool(use_pallas)
        self._semiring = semiring
        self._vec_semiring = vec_semiring
        self._vec2_semiring = vec2_semiring
        self._plans = {}
        self._edges = {}
        # Scalar ⊕ programs run on the v2u unified kernel (version 3) —
        # one routed/out-gather plan serves sum, min, max and 'or'; the
        # K-wide vector paths keep their own layouts.  Set
        # GRAPHMAT_KERNEL=v2 to fall back to the round-1 split kernels
        # (v2r MXU-scatter sum + v2m colored min/max).
        legacy = legacy_kernel_env()
        self.pallas_version = 1
        if self.use_pallas:
            if self.use_pallas_vec2 or (not self.use_pallas_vec
                                        and semiring is not None):
                self.pallas_version = 2
                if (semiring is not None and not self.use_pallas_vec2
                        and not legacy):
                    self.pallas_version = 3
            for recv in _direction_receivers(program.order):
                if self.use_pallas_vec2:
                    self._plans[recv] = graph.pallas_plan_vec2(recv)
                elif self.pallas_version == 3:
                    self._plans[recv] = graph.pallas_plan2u(recv)
                elif self.pallas_version != 2:
                    self._plans[recv] = graph.pallas_plan(recv)
                elif semiring.reduce_kind == "sum":
                    self._plans[recv] = graph.pallas_plan2(recv)
                else:
                    self._plans[recv] = graph.pallas_plan2m(recv)
        else:
            for recv in _direction_receivers(program.order):
                self._edges[recv] = graph.edges_for(recv)
        self._msg_width = {}
        if getattr(program, "vector_message", False):
            from ..ops.neighbors import max_degree
            for recv in _direction_receivers(program.order):
                self._msg_width[recv] = (program.max_message_width
                                         if program.max_message_width
                                         else max_degree(graph, recv))
        # Plan arrays must flow through jit ARGUMENTS, not closure captures —
        # captured device arrays become inline constants in the compiled
        # program (hundreds of MB for big graphs).
        if self.use_pallas_vec2:
            from ..ops.pallas_spmv_vec2 import planv_call_args
            self._plan_args = {
                recv: (planv_call_args(p)[0], p.got_static)
                for recv, p in self._plans.items()}
        elif self.pallas_version == 3:
            from ..ops.pallas_spmv2u import plan_call_args
            use_ev = semiring.uses_edge_value
            self._plan_args = {
                recv: (plan_call_args(p, use_val=use_ev)[0], p.got_static)
                for recv, p in self._plans.items()}
        elif self.pallas_version == 2 and semiring is not None \
                and semiring.reduce_kind != "sum":
            use_ev = semiring.uses_edge_value
            self._plan_args = {
                recv: ((p.kindid, p.blkid, p.base, p.ngran, p.rowmask,
                        p.pk, p.val if use_ev else None),
                       p.got_static)
                for recv, p in self._plans.items()}
        elif self.pallas_version == 2:
            use_ev = semiring is None or semiring.uses_edge_value
            self._plan_args = {
                recv: ((p.kindid, p.blkid, p.base, p.kind2, p.base2,
                        p.pk, p.val if use_ev else None), p.got_static)
                for recv, p in self._plans.items()}
        else:
            self._plan_args = {
                recv: ((p.blkid, p.hiabs, p.slo, p.rrel, p.vals, p.mask),
                       p.got_static)
                for recv, p in self._plans.items()}

        def step(carry, structure):
            it, state, vp, active, _converged = carry
            prog = self.program
            valid_vertex = structure["valid_vertex"]

            msg, send_mask = prog.send_message(state, vp)
            sent = active & valid_vertex
            if send_mask is not None:
                sent = sent & send_mask

            if self.use_pallas_vec2:
                reduced, got = self._pallas_vec2_directions(
                    state, msg, sent, vp, structure["plans"])
            elif self.use_pallas_vec:
                reduced, got = self._pallas_vec_directions(
                    state, msg, sent, vp, structure["plans"])
            elif self.use_pallas:
                recv_final = None
                if self.pallas_version == 3:
                    recv_final = prog.receiver_final(state, vp, it)
                    if recv_final is not None:
                        # pad vertices can never change: count them final
                        # so tail blocks stay skippable
                        recv_final = recv_final | ~valid_vertex
                reduced, got = self._pallas_directions(
                    state, msg, sent, structure["plans"],
                    recv_final=recv_final)
            else:
                reduced = None
                got = None
                vecmsg = getattr(prog, "vector_message", False)
                for recv in _direction_receivers(prog.order):
                    ea: EdgeArrays = structure["edges"][recv]
                    x_e = tree_util.tree_map(lambda a: a[ea.senders], msg)
                    e_ok = sent[ea.senders] & ea.valid
                    vp_r = None
                    if prog.process_requires_vertexprop:
                        vp_r = tree_util.tree_map(
                            lambda a: a[ea.receivers], vp)
                    u_e = prog.process_message(state, x_e, ea.vals, vp_r)
                    if vecmsg:
                        from ..ops.segment import segment_concat_tree
                        partial = segment_concat_tree(
                            u_e, e_ok, ea.receivers, self._n_pad,
                            self._msg_width[recv], prog.vector_pad)
                    else:
                        u_e = masked_fill_identity(prog.reduce, u_e, e_ok)
                        partial = segment_reduce_tree(
                            prog.reduce, u_e, ea.receivers, self._n_pad)
                    g = segment_any(e_ok, ea.receivers, self._n_pad)
                    if reduced is None:
                        reduced, got = partial, g
                    elif vecmsg:
                        # concat across directions (ALL_EDGES)
                        reduced = tree_util.tree_map(
                            lambda a, b: jnp.concatenate([a, b], axis=1),
                            reduced, partial)
                        got = got | g
                    else:
                        reduced = _combine_tree(prog.reduce, reduced, partial)
                        got = got | g

            applied = prog.apply(state, reduced, vp)
            vp_new = _where_tree(got & valid_vertex, applied, vp)
            ch = prog.changed(vp, vp_new)
            ch = ch & got & valid_vertex
            converged = ~jnp.any(ch)

            state = prog.do_every_iteration(state, vp_new, it, self.ctx)

            if prog.activity == Activity.ALL_VERTICES:
                active_new = valid_vertex
            else:
                active_new = ch
            return (it + 1, state, vp_new, active_new, converged)

        def run_fixed(structure, state, vp, active, n_iters):
            def body(_i, carry):
                return step(carry, structure)
            carry0 = (jnp.int32(0), state, vp, active, jnp.bool_(False))
            return jax.lax.fori_loop(0, n_iters, body, carry0)

        def run_conv(structure, state, vp, active, max_iters):
            def cond(carry):
                it, _s, _v, _a, converged = carry
                return (~converged) & (it < max_iters)

            def body(carry):
                return step(carry, structure)
            carry0 = (jnp.int32(0), state, vp, active, jnp.bool_(False))
            return jax.lax.while_loop(cond, body, carry0)

        self._step = jax.jit(lambda structure, state, vp, active:
                             step((jnp.int32(0), state, vp, active,
                                   jnp.bool_(False)), structure))
        self._run_fixed = jax.jit(run_fixed, static_argnums=(4,))
        self._run_conv = jax.jit(run_conv)

    def _pallas_directions(self, state, msg, sent, plans, recv_final=None):
        """All directions through the Pallas SpMV kernel; returns
        (reduced pytree, got bool[n_pad]).  ``plans`` carries the plan
        arrays as traced arguments.  ``recv_final`` is the program's
        exact receiver-finality mask (see
        :meth:`GraphProgram.receiver_final`), honored on the v2u sparse
        path only."""
        from ..ops.pallas_spmv import _spmv_call
        from ..ops.pallas_spmv2 import _spmv2_call, _spmv2m_call
        from ..ops.pallas_spmv2u import _spmv2u_call
        prog = self.program
        sem: PallasSemiring = self._semiring
        kind = sem.reduce_kind
        v3 = self.pallas_version == 3
        v2 = self.pallas_version == 2 or v3
        interpret = jax.default_backend() != "tpu"

        x = sem.encode(msg).astype(jnp.float32)
        dense = (prog.activity == Activity.ALL_VERTICES)
        want_got = v2 and kind == "sum" and not dense
        if kind == "sum":
            x = jnp.where(sent, x, 0.0)
            if want_got:
                # ride the frontier bit on x's low mantissa bit: the kernel
                # strips it before ⊗ and returns per-receiver counts in the
                # same launch — no second SpMV for the y bitvector
                from ..ops.pallas_spmv2 import encode_sent_bit
                x = encode_sent_bit(x, sent)
        else:
            fill = jnp.float32(PALLAS_BIG if kind == "min" else -PALLAS_BIG)
            x = jnp.where(sent, x, fill)
            x = jnp.clip(x, -PALLAS_BIG, PALLAS_BIG)
        # ACTIVE_ONLY programs feed the sender mask to the v2 kernels for
        # frontier-driven chunk skipping (the reference's sparse-frontier
        # column skip, singlenode/spmspv.h:48-60)
        sent_arg = None if dense or not v2 else sent

        y = None
        got = None
        for recv in _direction_receivers(prog.order):
            plan = self._plans[recv]
            plan_arrays, got_static = plans[recv]
            if v3:
                from ..ops.pallas_spmv2u import plan_call_args
                plan_static = plan_call_args(plan)[1]
            elif v2:
                plan_static = (plan.h, plan.wr, plan.nb, plan.nc,
                               plan.n_pad, plan.classes, plan.rows)
            else:
                plan_static = (plan.nc, plan.nb, plan.wr, plan.h,
                               plan.n_pad, plan.row_e, plan.win)

            def call(xin, kd, proc):
                xp = xin
                if xp.shape[0] < plan.n_send_pad:
                    xp = jnp.pad(xp, (0, plan.n_send_pad - xp.shape[0]))
                if v3:
                    return _spmv2u_call(plan_arrays, plan_static,
                                        xp[: plan.n_send_pad], kd, proc,
                                        interpret, sent=sent_arg,
                                        want_got=want_got,
                                        recv_final=(recv_final
                                                    if sent_arg is not None
                                                    else None))
                if v2 and kd == "sum":
                    ns = getattr(sem, "n_splits", 3)
                    return _spmv2_call(plan_arrays, plan_static,
                                       xp[: plan.n_send_pad], proc,
                                       ns, interpret, sent=sent_arg,
                                       want_got=want_got)
                if v2:
                    return _spmv2m_call(plan_arrays, plan_static,
                                        xp[: plan.n_send_pad], kd, proc,
                                        interpret, sent=sent_arg)
                return _spmv_call(plan_arrays, plan_static,
                                  xp[: plan.n_send_pad], kd, proc, interpret)

            if want_got:
                y_dir, cnt = call(x, kind, sem.process)
                y_dir = y_dir[: self._n_pad]
                g_dir = cnt[: self._n_pad] > 0
            else:
                y_dir = call(x, kind, sem.process)[: self._n_pad]
            if want_got:
                pass
            elif kind == "sum":
                if dense:
                    g_dir = got_static[: self._n_pad]
                else:
                    sentf = jnp.where(sent, 1.0, 0.0).astype(jnp.float32)
                    from ..ops.pallas_spmv import _identity_process
                    g_dir = call(sentf, "sum",
                                 _identity_process)[: self._n_pad] > 0
            elif kind == "min":
                g_dir = y_dir < PALLAS_BIG / 2
                y_dir = jnp.where(g_dir, y_dir, jnp.inf)
            else:
                g_dir = y_dir > -PALLAS_BIG / 2
                y_dir = jnp.where(g_dir, y_dir, -jnp.inf)
            if y is None:
                y, got = y_dir, g_dir
            else:
                y = (y + y_dir if kind == "sum" else
                     (jnp.minimum(y, y_dir) if kind == "min"
                      else jnp.maximum(y, y_dir)))
                got = got | g_dir
        return sem.decode(y), got

    def _pallas_vec2_directions(self, state, msg, sent, vp, plans):
        """v2 K-wide vector directions (32-lane edge blocks; K > 32 runs
        ceil(K/32) stacked planes through one shared plan)."""
        from ..ops.pallas_spmv_vec2 import (KPAD, _pack_planes,
                                            _spmv_vec2_call,
                                            planv_call_args)
        prog = self.program
        sem = self._vec2_semiring
        interpret = jax.default_backend() != "tpu"

        x = sem.encode(state, msg).astype(jnp.float32)       # [n_pad, K]
        x = jnp.where(sent[:, None], x, 0.0)
        vp_enc = None
        if sem.needs_vp:
            vp_enc = sem.encode_vp(state, vp).astype(jnp.float32)
        kb = max(1, -(-x.shape[1] // KPAD),
                 -(-vp_enc.shape[1] // KPAD) if vp_enc is not None else 1)
        extra = sem.extra_fn(state) if sem.extra_fn is not None else None
        ex = None
        if extra is not None:
            exf = jnp.pad(extra.reshape(-1),
                          (0, kb * KPAD - extra.size))
            ex = jnp.concatenate([jnp.tile(exf[p * KPAD:(p + 1) * KPAD],
                                           4) for p in range(kb)])

        y = None
        got = None
        for recv in _direction_receivers(prog.order):
            plan = self._plans[recv]
            plan_arrays, got_static = plans[recv]
            plan_static = planv_call_args(plan)[1]
            xw = _pack_planes(x, plan.n_send_pad, kb)
            vw = (_pack_planes(vp_enc, plan.n_pad, kb)
                  if vp_enc is not None
                  else jnp.zeros(kb * plan.hr * 128, jnp.float32))
            y_dir = _spmv_vec2_call(plan_arrays, plan_static, xw, vw, ex,
                                    sem.process, sem.n_splits, interpret,
                                    ex is not None,
                                    kb=kb)[: self._n_pad]
            g_dir = got_static[: self._n_pad]
            if y is None:
                y, got = y_dir, g_dir
            else:
                y = y + y_dir
                got = got | g_dir
        # slice to the encoded width (shape-tolerant if data K < sem.k)
        return sem.decode(y[:, : max(x.shape[1], 1)]), got

    def _pallas_vec_directions(self, state, msg, sent, vp, plans):
        """K-wide vector-message directions (SpMSpV3 workloads)."""
        from ..ops.pallas_spmv import _identity_process, _spmv_call
        from ..ops.pallas_spmv_vec import _spmv_vec_call
        prog = self.program
        sem: PallasVecSemiring = self._vec_semiring
        interpret = jax.default_backend() != "tpu"
        dense = prog.activity == Activity.ALL_VERTICES

        x = sem.encode(state, msg).astype(jnp.float32)       # [n_pad, K]
        x = jnp.where(sent[:, None], x, 0.0)
        vp_enc = None
        if sem.needs_vp:
            vp_enc = sem.encode_vp(state, vp).astype(jnp.float32)
        extra = sem.extra_fn(state) if sem.extra_fn is not None else None

        y = None
        got = None
        for recv in _direction_receivers(prog.order):
            plan = self._plans[recv]
            plan_arrays, got_static = plans[recv]
            plan_static = (plan.nc, plan.nb, plan.wr, plan.h, plan.n_pad,
                           plan.row_e, plan.win)
            xp = x
            if xp.shape[0] < plan.n_send_pad:
                xp = jnp.pad(xp, ((0, plan.n_send_pad - xp.shape[0]),
                                  (0, 0)))
            y_dir = _spmv_vec_call(plan_arrays, plan_static,
                                   xp[: plan.n_send_pad], vp_enc, extra,
                                   sem.process, sem.k, sem.x_splits,
                                   sem.vp_splits, interpret)[: self._n_pad]
            if dense:
                g_dir = got_static[: self._n_pad]
            else:
                sentf = jnp.where(sent, 1.0, 0.0).astype(jnp.float32)
                sp = sentf
                if sp.shape[0] < plan.n_send_pad:
                    sp = jnp.pad(sp, (0, plan.n_send_pad - sp.shape[0]))
                g_dir = _spmv_call(plan_arrays, plan_static,
                                   sp[: plan.n_send_pad], "sum",
                                   _identity_process,
                                   interpret)[: self._n_pad] > 0
            if y is None:
                y, got = y_dir, g_dir
            else:
                y = y + y_dir
                got = got | g_dir
        return sem.decode(y), got

    @property
    def vector_reduced_width(self) -> int:
        """Static width D of the ``reduced`` rows a vector-message
        program's ``apply`` receives (directions concat along axis 1)."""
        return sum(self._msg_width.values())

    def _structure(self):
        return {"edges": self._edges,
                "plans": self._plan_args,
                "valid_vertex": self.graph.valid_vertex}

    def run(self, iterations: int = UNTIL_CONVERGENCE,
            max_iterations: int = 1_000_000, state: Any = None) -> int:
        """Run the program on the bound graph, updating ``graph.vp`` /
        ``graph.active`` in place.  Returns the number of iterations
        completed (the reference prints ``Completed %d iterations``).

        ``iterations <= 0`` means run until convergence
        (``GraphMatRuntime.h:266-271``).
        """
        g = self.graph
        if state is None:
            state = self.program.init_state(g)
        if self.program.activity == Activity.ALL_VERTICES:
            g.set_all_active()
        structure = self._structure()
        if iterations is not None and iterations > 0:
            it, state, vp, active, _ = self._run_fixed(
                structure, state, g.vp, g.active, int(iterations))
        else:
            it, state, vp, active, _ = self._run_conv(
                structure, state, g.vp, g.active, jnp.int32(max_iterations))
        g.vp = vp
        g.active = active
        # one batched fetch: each separate host read pays a full device
        # round-trip (~30 ms through the axon tunnel)
        it_val, self.final_state = jax.device_get((it, state))
        return int(it_val)

    def step_once(self, state=None):
        """Single un-looped iteration (debugging / stats)."""
        g = self.graph
        if state is None:
            state = self.program.init_state(g)
        it, state, vp, active, converged = self._step(
            self._structure(), state, g.vp, g.active)
        g.vp = vp
        g.active = active
        return state, bool(converged)


def graph_program_init(program: GraphProgram, graph: Graph) -> Engine:
    """Name-parity helper for the reference's ``graph_program_init``."""
    return Engine(program, graph)


def run_graph_program(program: GraphProgram, graph: Graph,
                      iterations: int = UNTIL_CONVERGENCE,
                      engine: Optional[Engine] = None,
                      max_iterations: int = 1_000_000) -> int:
    """Run ``program`` on ``graph``; returns iterations completed."""
    if engine is None:
        engine = Engine(program, graph)
    return engine.run(iterations=iterations, max_iterations=max_iterations)
