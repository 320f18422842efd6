"""Pallas SpMV plan + kernel tests (interpret mode on CPU) vs numpy oracle.
Mirrors ``test/test_spmv.cpp``'s identity/random SpMV checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from graphmat_tpu.ops.pallas_spmv import build_spmv_plan, spmv
from graphmat_tpu.utils.generators import (identity_edgelist, random_edgelist,
                                           rmat_edgelist)


def oracle_spmv(s0, r0, v, x, n_pad, kind="sum", process=None):
    if process is None:
        process = lambda xv, ev: xv
    init = {"sum": 0.0, "min": np.inf, "max": -np.inf}[kind]
    y = np.full(n_pad, init, np.float64)
    p = process(x[s0].astype(np.float64), v.astype(np.float64))
    op = {"sum": np.add, "min": np.minimum, "max": np.maximum}[kind]
    getattr(op, "at")(y, r0, p)
    return y


def run_case(e, x=None, kind="sum", process=None, nproc=None, wr=512):
    n = max(e.m, e.n)
    s0, r0, v = e.src - 1, e.dst - 1, e.val
    plan = build_spmv_plan(s0, r0, v, n, wr=wr)
    if x is None:
        rng = np.random.default_rng(42)
        x = rng.standard_normal(plan.n_pad).astype(np.float32)
    y = np.asarray(spmv(plan, jnp.asarray(x), reduce_kind=kind,
                        process=process, interpret=True))
    expect = oracle_spmv(s0, r0, v, x, plan.n_pad, kind, nproc)
    return y, expect, plan


def test_identity_spmv():
    e = identity_edgelist(300)
    y, expect, plan = run_case(e)
    has = np.isfinite(expect) & (expect != 0)
    np.testing.assert_allclose(y[:300], expect[:300], rtol=1e-4, atol=1e-5)


def test_random_sum():
    e = random_edgelist(600, 8, seed=3, weight_range=5)
    y, expect, plan = run_case(e)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_random_sum_with_process():
    e = random_edgelist(400, 6, seed=9, weight_range=7)
    y, expect, plan = run_case(
        e,
        process=lambda xv, ev: xv * ev,
        nproc=lambda xv, ev: xv * ev)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_min_semiring():
    e = random_edgelist(500, 5, seed=11, weight_range=9)
    rng = np.random.default_rng(1)
    x = (rng.random(512 * 1) * 100).astype(np.float32)
    n = max(e.m, e.n)
    s0, r0, v = e.src - 1, e.dst - 1, e.val
    plan = build_spmv_plan(s0, r0, v, n)
    x = (rng.random(plan.n_pad) * 100).astype(np.float32)
    y = np.asarray(spmv(plan, jnp.asarray(x), reduce_kind="min",
                        process=lambda xv, ev: xv + ev, interpret=True))
    expect = oracle_spmv(s0, r0, v, x, plan.n_pad, "min",
                         lambda xv, ev: xv + ev)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_max_semiring():
    e = random_edgelist(300, 4, seed=13)
    y, expect, plan = run_case(e, kind="max")
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_empty_blocks_written():
    """A graph with edges only at the start: later y blocks must still be
    zero-filled, not garbage."""
    e = identity_edgelist(10)
    e.m = e.n = 2000  # force many empty receiver blocks
    y, expect, plan = run_case(e)
    assert y.shape[0] == plan.n_pad
    np.testing.assert_allclose(y[10:], 0.0)


def test_hub_vertex():
    """One receiver with huge in-degree (power-law hub)."""
    n = 700
    src = np.arange(1, n + 1, dtype=np.int32)
    dst = np.full(n, 5, np.int32)
    from graphmat_tpu.io.edgelist import edgelist_from_arrays
    e = edgelist_from_arrays(src, dst, np.ones(n, np.int32), m=n, n=n)
    y, expect, plan = run_case(e)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-3)


def test_rmat_small():
    e = rmat_edgelist(9, 8, seed=7)
    y, expect, plan = run_case(e)
    np.testing.assert_allclose(y, expect, rtol=1e-3, atol=1e-3)


# ------------------------- engine pallas path (interpret mode on CPU)

def _run_app_pallas(app_fn, *args, **kw):
    return app_fn(*args, **kw)


def test_engine_pallas_pagerank_matches_xla():
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.pagerank import (DegreeProgram, PageRankProgram,
                                            init_pagerank_graph)
    from graphmat_tpu.core.runtime import Engine
    e = random_edgelist(300, 6, seed=21)
    g1 = Graph(e)
    init_pagerank_graph(g1)
    g1.set_all_active()
    Engine(DegreeProgram(), g1, use_pallas=False).run(iterations=1)
    Engine(PageRankProgram(), g1, use_pallas=False).run()
    ref = g1.vp_numpy()

    g2 = Graph(e)
    init_pagerank_graph(g2)
    g2.set_all_active()
    Engine(DegreeProgram(), g2, use_pallas=True).run(iterations=1)
    it2 = Engine(PageRankProgram(), g2, use_pallas=True).run()
    out = g2.vp_numpy()
    np.testing.assert_array_equal(out["degree"], ref["degree"])
    np.testing.assert_allclose(out["pagerank"], ref["pagerank"],
                               rtol=2e-5, atol=2e-5)


def test_engine_pallas_bfs_matches_xla():
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.bfs import BFSProgram, init_bfs_graph
    from graphmat_tpu.core.runtime import Engine
    e = random_edgelist(200, 3, seed=23)
    g1 = Graph(e, build_in_edges=False)
    init_bfs_graph(g1, 1)
    it1 = Engine(BFSProgram(), g1, use_pallas=False).run()
    ref = g1.vp_numpy()

    g2 = Graph(e, build_in_edges=False)
    init_bfs_graph(g2, 1)
    it2 = Engine(BFSProgram(), g2, use_pallas=True).run()
    out = g2.vp_numpy()
    assert it1 == it2
    np.testing.assert_array_equal(out["depth"], ref["depth"])
    np.testing.assert_array_equal(out["parent"], ref["parent"])


def test_engine_pallas_sssp_matches_xla():
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.sssp import SSSPProgram, init_sssp_graph
    from graphmat_tpu.core.runtime import Engine
    e = random_edgelist(150, 4, seed=29, weight_range=9)
    g1 = Graph(e, build_in_edges=False)
    init_sssp_graph(g1, 1)
    Engine(SSSPProgram(), g1, use_pallas=False).run()
    ref = g1.vp_numpy()["distance"]

    g2 = Graph(e, build_in_edges=False)
    init_sssp_graph(g2, 1)
    Engine(SSSPProgram(), g2, use_pallas=True).run()
    np.testing.assert_array_equal(g2.vp_numpy()["distance"], ref)


def test_awkward_vertex_counts():
    """n just over a multiple of 16384 makes h=129 — the window clamp must
    stay 8-aligned (regression: misaligned dynamic slices)."""
    for n in (16384, 16400, 16513):
        e = random_edgelist(n, 2, seed=31)
        s0, r0, v = e.src - 1, e.dst - 1, e.val
        from graphmat_tpu.ops.pallas_spmv import build_spmv_plan, spmv
        plan = build_spmv_plan(s0, r0, v, n)
        assert plan.h % 8 == 0
        rng = np.random.default_rng(1)
        x = rng.standard_normal(plan.n_send_pad).astype(np.float32)
        y = np.asarray(spmv(plan, jnp.asarray(x), interpret=True))
        expect = oracle_spmv(s0, r0, v, x, plan.n_pad)
        np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-3)
