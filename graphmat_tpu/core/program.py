"""The GraphProgram vertex-program API.

JAX-traceable re-design of the reference's abstract ``GraphProgram<T,U,V,E>``
(``include/GraphProgram.h:38-101``).  The four virtuals become pure,
*vectorized* jnp functions operating on whole arrays (leading dim = vertices
or edges) instead of per-element C++ callbacks:

==============================  =============================================
reference (per element)          here (vectorized, pure)
==============================  =============================================
``bool send_message(V, T&)``     ``send_message(state, vp) -> (msg, mask)``
``process_message(T,E,V,U&)``    ``process_message(state, msg, evals, vp_r)``
``reduce_function(U&, U)``       ``reduce`` — a :class:`Monoid` (or pytree of
                                 monoids / generic combine)
``apply(U, V&)``                 ``apply(state, reduced, vp) -> vp``
``operator!=``                   ``changed(old_vp, new_vp) -> bool[n]``
``do_every_iteration(int)``      ``do_every_iteration(state, vp, it, ctx)``
==============================  =============================================

Program *state* (e.g. BFS's ``current_depth``, DeltaStepping's bucket id,
LDA's ``global_N``) is an explicit pytree threaded through the jitted
iteration loop, replacing the reference's mutable members.

The whole step — send/mask, edge gather, ⊗, segment-⊕, apply, activity
diff, convergence all-reduce — traces into ONE XLA computation per program,
so an entire ``run_graph_program`` is a single compiled ``while_loop``/
``fori_loop`` on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
from jax import tree_util

from .types import Activity, Direction, Monoid, SUM

__all__ = ["GraphProgram", "IterationContext", "PallasSemiring",
           "PallasVecSemiring"]


def _identity_process(xv, ev):
    return xv


def _identity_codec(x):
    return x


@dataclass(frozen=True)
class PallasSemiring:
    """Opt-in declaration of a program's semiring for the Pallas SpMV path.

    Declares ⊕/⊗ in the elementwise-f32 form the TPU kernel executes
    (``ops.pallas_spmv``).  Requirements:

    * ``reduce_kind`` ∈ {'sum', 'min', 'max'} — the ⊕ monoid;
    * ``process(xv, edge_val)`` — elementwise jnp ⊗, and it must absorb the
      ⊕ identity (``process(ident, ev) == ident``) since inactive senders
      are encoded as the identity (0 for sum, ±inf for min/max);
    * ``encode(msg)`` maps the message pytree to one f32[n] array
      (sentinels such as INT32_MAX become ±inf here);
    * ``decode(y)`` maps the reduced f32[n] back to the reduced-message
      pytree consumed by ``apply``.

    Integer payloads are exact up to 2^24 in f32 (vertex ids, depths,
    bounded distances) — the kernel's gather/scatter paths are themselves
    f32-exact via bf16 hi/lo splits.
    """

    reduce_kind: str = "sum"
    process: Callable = _identity_process
    encode: Callable = _identity_codec
    decode: Callable = _identity_codec
    # bf16 planes for the v2 scatter matmul: 3 = f32-exact; 2 = 2^-17
    # relative (exact for integer payloads < 2^17) and ~13% faster
    n_splits: int = 3
    # False when ``process`` ignores the edge value (PageRank, Degree,
    # BFS...): the kernel then skips the per-chunk edge-value stream
    # entirely.  This makes the reference's declared-but-never-read
    # ``process_message_requires_edge_value`` flag (GraphProgram.h:46)
    # actually do something.
    uses_edge_value: bool = True


@dataclass(frozen=True)
class PallasVecSemiring:
    """Opt-in declaration for the K-wide vector-message TPU kernel
    (``ops.pallas_spmv_vec``) — the SpMSpV3 workloads (SGD/LDA).

    * ``k``: message width;
    * ``process(xv, ev, vpr, extra)``: ⊗ on ``[K, e]`` tiles — ``vpr`` is
      the gathered receiver operand (None unless ``needs_vp``), ``extra``
      a broadcast state vector (None unless ``extra_fn``);
    * ``encode(state, msg_pytree) -> f32[n, K]``; with ``needs_vp``,
      ``encode_vp(state, vp_pytree) -> f32[n, K]``;
    * ``decode(y[n, K]) -> reduced pytree`` consumed by ``apply``;
    * ``extra_fn(state) -> f32[1, K_extra]`` threads per-iteration state
      (e.g. LDA's global topic totals) into the kernel;
    * ``x_splits``/``vp_splits``: bf16 split counts (2 ≈ f32 to 2^-17).

    ⊕ is sum; senders that did not send are encoded as zero, so ⊗ must
    absorb zero messages (all reference vector workloads do: SGD/LDA
    messages scale multiplicatively).
    """

    k: int = 1
    process: Callable = lambda xv, ev, vpr, extra: xv
    encode: Callable = None
    encode_vp: Callable = None
    decode: Callable = _identity_codec
    needs_vp: bool = False
    extra_fn: Callable = None
    x_splits: int = 2
    vp_splits: int = 2


@dataclass(frozen=True)
class PallasVec2Semiring:
    """Opt-in declaration for the v2 K-wide vector kernel
    (``ops.pallas_spmv_vec2``) — 32-lane edge blocks, f32-exact tala
    gathers, batched scatter matmul.

    * ``k``: message width (<= 32);
    * ``process(xv, ev, vpr, extra, rid, block_sum)``: ⊗ on ``[rows, 128]``
      tiles where each 32-lane block is one edge's K-vector; ``block_sum``
      sums within blocks (broadcast back), ``rid`` is the global receiver
      id replicated per block, ``extra`` a [1, 128] broadcast row (the
      ``extra_fn`` vector tiled over the four blocks);
    * ``encode/encode_vp/decode/extra_fn`` as in :class:`PallasVecSemiring`
      (decode receives ``y[n_pad, 32]``);
    * ``n_splits``: bf16 planes in the scatter/block_sum (2 ≈ 2^-17).

    ⊕ is sum; requires ``Activity.ALL_VERTICES`` (got comes from the
    static structure).
    """

    k: int = 1
    process: Callable = None
    encode: Callable = None
    encode_vp: Callable = None
    decode: Callable = _identity_codec
    needs_vp: bool = False
    extra_fn: Callable = None
    n_splits: int = 2


class IterationContext:
    """Facilities available to ``do_every_iteration``.

    On a single device the cross-device reduces are identity; under the
    sharded runtime they become ``psum``-style collectives (replacing the
    reference's MapReduce-to-rank-0-then-Bcast, ``multinode/reduce.h:54-72``).
    """

    def __init__(self, psum=None):
        self._psum = psum

    def all_reduce_sum(self, tree):
        if self._psum is None:
            return tree
        return self._psum(tree)

    def masked_vertex_sum(self, values, valid_vertex):
        """Sum an ``[n_pad, ...]`` array over valid vertices, globally."""
        def one(leaf):
            mask = valid_vertex.reshape(
                valid_vertex.shape + (1,) * (leaf.ndim - 1))
            return jnp.sum(jnp.where(mask, leaf, 0), axis=0)
        return self.all_reduce_sum(tree_util.tree_map(one, values))


class GraphProgram:
    """Base class for vertex programs.  Subclass and override.

    Class/instance attributes (static — changing them recompiles):

    * ``order``: :class:`Direction` (default OUT_EDGES, ``GraphProgram.h:52``)
    * ``activity``: :class:`Activity` (default ACTIVE_ONLY)
    * ``reduce``: the ⊕ monoid — a :class:`Monoid` or a pytree of monoids
      matching the reduced-message pytree
    * ``process_requires_vertexprop``: set False when ``process_message``
      ignores the receiver's property — skips a gather (the reference's
      SpMSpV vs SpMSpV3 selection, ``SPMV.h:67-71``)
    * ``vector_message``: True makes ⊕ a CONCAT — each receiver collects
      ALL its incoming contributions into a static-width padded row, so
      ``apply`` receives ``[n_pad, D, ...]`` (D = the direction's max
      in-degree, or ``max_message_width``) padded with ``vector_pad``.
      The TPU-native form of the reference's variable-length
      ``Serializable`` messages + vector-append reduce
      (``test/test_get_neighbors.cpp:131-137``,
      ``src/TriangleCounting.cpp:92-109``); ``reduce`` is ignored.
    * ``vector_pad``: pad value for concat rows (casts per leaf).
    * ``max_message_width``: static cap on D (contributions beyond it
      drop — size it to the graph's max in-degree, the default).
    """

    order: Direction = Direction.OUT_EDGES
    activity: Activity = Activity.ACTIVE_ONLY
    reduce: Any = SUM
    process_requires_vertexprop: bool = True
    vector_message: bool = False
    vector_pad: Any = 2**31 - 1
    max_message_width: Optional[int] = None

    # -------------------------------------------------------------- hooks

    def init_state(self, graph) -> Any:
        """Initial program-state pytree (scan carry)."""
        return ()

    def send_message(self, state, vp) -> Tuple[Any, Optional[Any]]:
        """Produce the message pytree for every vertex ([n_pad] leading dim)
        and an optional boolean send mask (None = all send).

        Only entries where the vertex is active AND the mask holds reach any
        receiver — the reference's bool return from ``send_message``.
        """
        raise NotImplementedError

    def process_message(self, state, msg, edge_vals, vp_receiver) -> Any:
        """⊗: combine gathered sender messages ([e_pad] leading dim) with
        edge values (and, if ``process_requires_vertexprop``, the receiver's
        gathered properties) into reduced-message contributions."""
        raise NotImplementedError

    def apply(self, state, reduced, vp) -> Any:
        """Produce the new vertex-property pytree from the reduced messages.

        Called vectorized over all vertices; the runtime keeps the old
        property wherever no message arrived (the reference only invokes
        ``apply`` under the y bitvector, ``GraphMatRuntime.h:196-216``).
        """
        raise NotImplementedError

    def changed(self, old_vp, new_vp) -> Any:
        """Per-vertex bool: did the property change (``operator!=``)?

        Default: any leaf differs elementwise.
        """
        leaves_old = tree_util.tree_leaves(old_vp)
        leaves_new = tree_util.tree_leaves(new_vp)
        acc = None
        for o, nw in zip(leaves_old, leaves_new):
            neq = o != nw
            if neq.ndim > 1:
                neq = jnp.any(neq, axis=tuple(range(1, neq.ndim)))
            acc = neq if acc is None else (acc | neq)
        return acc

    def do_every_iteration(self, state, vp, it, ctx: IterationContext):
        """Per-iteration state update hook (``GraphProgram.h:98``).  Must be
        traceable; runs inside the compiled loop after apply."""
        return state

    def receiver_final(self, state, vp, it):
        """Optional monotone-finality hint for the sparse kernel path.

        Return a bool[n_pad] mask of receivers whose vertex property can
        no longer change at sweep ``it`` (0-based), or None (default).
        The kernel then skips chunks whose receiver block is entirely
        final — the receiver-side dual of the sender-frontier chunk skip
        (the reference's y-bitvector early-out inside the multiply,
        ``singlenode/spmspv.h:64-81``, generalized to dead receivers).

        The mask must be EXACT: every skipped update would have been a
        no-op, so results (including reduce tie-breaks) are bit-identical
        with or without the hint.  Only monotone programs whose apply is
        a no-op once a vertex is final can implement this (e.g. BFS:
        ``depth < INF``; packed-key BFS: ``key_depth <= it``, since a
        sweep-``it`` message always carries depth >= it + 1)."""
        return None

    def pallas_semiring(self) -> Optional["PallasSemiring"]:
        """Return a :class:`PallasSemiring` to enable the TPU fast path,
        or None to always use the XLA segment-reduce path."""
        return None

    def pallas_vec_semiring(self) -> Optional["PallasVecSemiring"]:
        """Return a :class:`PallasVecSemiring` to enable the K-wide TPU
        fast path (vector messages / 3-operand programs)."""
        return None

    def pallas_vec2_semiring(self) -> Optional["PallasVec2Semiring"]:
        """Return a :class:`PallasVec2Semiring` to enable the v2 K-wide
        TPU kernel (preferred over the v1 vec path when present)."""
        return None
