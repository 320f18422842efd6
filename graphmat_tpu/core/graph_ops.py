"""Whole-graph vertex/edge operations.

Device-side implementations of the reference's Graph-level helpers:

* ``applyToAllVertices``  (``Graph.h:353-374``) — elementwise vp transform;
* ``applyReduceAllVertices`` (``Graph.h:377-381`` → MapReduce,
  ``multinode/reduce.h:39-74``) — map over vertices then global reduce;
* ``applyToAllEdges`` (``Graph.h:390-402`` → ApplyEdges,
  ``multinode/applyedges.h:45-161``) — rewrite every edge value as a
  function of both endpoint properties (used for SGD-style edge updates).

The reference keeps A and AT as separate physical copies and runs the edge
update twice with swapped arguments; here both receiver orderings share the
logical edge set, so one vectorized computation per ordering keeps them
consistent (and invalidates cached Pallas plans).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

from .graph import EdgeArrays, Graph

__all__ = ["apply_to_all_vertices", "apply_reduce_all_vertices",
           "apply_to_all_edges"]


def apply_to_all_vertices(graph: Graph, fn: Callable) -> None:
    """vp <- fn(vp) elementwise over valid vertices (pytree -> pytree)."""
    new_vp = fn(graph.vp)
    mask = graph.valid_vertex

    def keep(new, old):
        m = mask.reshape(mask.shape + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)
    graph.vp = tree_util.tree_map(keep, new_vp, graph.vp)


def apply_reduce_all_vertices(graph: Graph, map_fn: Callable,
                              reduce: str = "sum"):
    """Global scalar/array reduce of ``map_fn(vp)`` over valid vertices.

    ``map_fn(vp) -> [n_pad, ...]`` pytree; reduce in {'sum','min','max'}.
    Returns host values (the reference broadcasts the result to all ranks).
    """
    mapped = map_fn(graph.vp)
    mask = graph.valid_vertex
    op = {"sum": jnp.sum, "min": jnp.min, "max": jnp.max}[reduce]

    def neutral_for(dtype):
        if reduce == "sum":
            return jnp.array(0, dtype)
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.array(np.inf if reduce == "min" else -np.inf, dtype)
        info = jnp.iinfo(dtype)
        return jnp.array(info.max if reduce == "min" else info.min, dtype)

    def one(leaf):
        m = mask.reshape(mask.shape + (1,) * (leaf.ndim - 1))
        filled = jnp.where(m, leaf, neutral_for(leaf.dtype))
        return op(filled, axis=0)
    return jax.device_get(tree_util.tree_map(one, mapped))


def apply_to_all_edges(graph: Graph, fn: Callable) -> None:
    """Rewrite edge values: ``val <- fn(vp_src, vp_dst, val)`` for every
    edge, keeping both receiver orderings consistent.

    ``fn`` receives gathered pytrees of the source and destination vertex
    properties ([e_pad] leading dim) and the current values, returns new
    values.  Mirrors ``applyToAllEdges`` running over AT and A with swapped
    arguments (``Graph.h:393-401``).
    """
    def run(ea: EdgeArrays, sender_is_src: bool) -> EdgeArrays:
        vp_s = tree_util.tree_map(lambda a: a[ea.senders], graph.vp)
        vp_r = tree_util.tree_map(lambda a: a[ea.receivers], graph.vp)
        if sender_is_src:
            new_vals = fn(vp_s, vp_r, ea.vals)
        else:
            new_vals = fn(vp_r, vp_s, ea.vals)
        new_vals = jnp.where(ea.valid, new_vals, ea.vals)
        return EdgeArrays(ea.senders, ea.receivers,
                          new_vals.astype(ea.vals.dtype), ea.valid)

    if "dst" in graph._host_edges:
        graph._edge_arrays["dst"] = run(graph.edges_for("dst"),
                                        sender_is_src=True)
    if "src" in graph._host_edges:
        graph._edge_arrays["src"] = run(graph.edges_for("src"),
                                        sender_is_src=False)
    # host copies / kernel plans are stale now
    for recv, (s0, r0, _v) in list(graph._host_edges.items()):
        ea = graph._edge_arrays.get(recv)
        if ea is None:
            continue
        valid = np.asarray(ea.valid)
        order_vals = np.asarray(ea.vals)[valid]
        # host edges are stored unsorted; re-derive sorted copies
        senders = np.asarray(ea.senders)[valid]
        receivers = np.asarray(ea.receivers)[valid]
        graph._host_edges[recv] = (senders, receivers, order_vals)
    graph._pallas_plans.clear()
