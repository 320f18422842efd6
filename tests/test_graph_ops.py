"""applyToAllVertices / applyReduceAllVertices / applyToAllEdges tests —
mirrors ``test/test_apply_edges.cpp`` (val == src + s*dst invariant)."""

import jax.numpy as jnp
import numpy as np

from graphmat_tpu import Graph
from graphmat_tpu.core.graph_ops import (apply_reduce_all_vertices,
                                         apply_to_all_edges,
                                         apply_to_all_vertices)
from graphmat_tpu.utils.generators import random_edgelist


def make_graph(n=40, deg=4, seed=5):
    e = random_edgelist(n, deg, seed=seed)
    g = Graph(e)
    g.init_vertexproperty(val=np.arange(1, n + 1, dtype=np.int32))
    return g, e


def test_apply_to_all_vertices():
    g, e = make_graph()
    apply_to_all_vertices(g, lambda vp: {"val": vp["val"] * 2})
    np.testing.assert_array_equal(g.vp_numpy()["val"],
                                  2 * np.arange(1, 41))


def test_apply_reduce_sum_min_max():
    g, e = make_graph()
    out = apply_reduce_all_vertices(g, lambda vp: {"v": vp["val"]}, "sum")
    assert int(out["v"]) == sum(range(1, 41))
    out = apply_reduce_all_vertices(g, lambda vp: {"v": vp["val"]}, "min")
    assert int(out["v"]) == 1
    out = apply_reduce_all_vertices(g, lambda vp: {"v": vp["val"]}, "max")
    assert int(out["v"]) == 40


def test_apply_to_all_edges_src_plus_s_dst():
    """The reference's check: after apply, every edge value equals
    src_prop + 5 * dst_prop (``test/test_apply_edges.cpp:38-113``)."""
    g, e = make_graph()
    apply_to_all_edges(
        g, lambda vs, vd, val: vs["val"] + 5 * vd["val"])
    out = g.get_edges()
    for s, d, v in out.as_records():
        assert v == s + 5 * d  # vertex property == 1-based id

    # in_edges ordering stays consistent
    g2 = Graph(e)  # rebuild to compare via in-edge export
    r = Graph.__new__(Graph)  # not needed; use graph's in_edges directly
    ea = g.in_edges
    valid = np.asarray(ea.valid)
    srcs = np.asarray(ea.receivers)[valid] + 1
    dsts = np.asarray(ea.senders)[valid] + 1
    vals = np.asarray(ea.vals)[valid]
    for s, d, v in zip(srcs, dsts, vals):
        assert v == s + 5 * d


def test_apply_edges_invalidates_plans():
    g, e = make_graph()
    p1 = g.pallas_plan("dst")
    apply_to_all_edges(g, lambda vs, vd, val: val + 1)
    p2 = g.pallas_plan("dst")
    assert p1 is not p2
    # plan values reflect the updated edges
    assert float(jnp.sum(p2.vals)) == float(jnp.sum(p1.vals)) + e.nnz
