"""K-wide vector-message Pallas SpMV tests (interpret mode) vs numpy."""

import jax.numpy as jnp
import numpy as np

from graphmat_tpu.ops.pallas_spmv import build_spmv_plan
from graphmat_tpu.ops.pallas_spmv_vec import spmv_vec
from graphmat_tpu.utils.generators import random_edgelist


def setup(n=500, deg=5, k=6, seed=3):
    e = random_edgelist(n, deg, seed=seed, weight_range=5)
    s0, r0, v = e.src - 1, e.dst - 1, e.val
    plan = build_spmv_plan(s0, r0, v, n)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((plan.n_send_pad, k)).astype(np.float32)
    vp = rng.standard_normal((plan.n_pad, k)).astype(np.float32)
    return e, s0, r0, v, plan, x, vp


def test_vec_gather_sum():
    """process = xv (copy K-vectors along edges, sum per receiver)."""
    e, s0, r0, v, plan, x, vp = setup()
    y = np.asarray(spmv_vec(plan, jnp.asarray(x),
                            lambda xv, ev, vpr, extra, rid: xv, interpret=True))
    expect = np.zeros((plan.n_pad, x.shape[1]))
    np.add.at(expect, r0, x[s0].astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_vec_three_operand_sgd_shape():
    """SGD ⊗: p = xv * (rating − ⟨xv, vpr⟩)."""
    e, s0, r0, v, plan, x, vp = setup()

    def proc(xv, ev, vpr, extra, rid):
        est = jnp.sum(xv * vpr, axis=0, keepdims=True)
        return xv * (ev - est)

    y = np.asarray(spmv_vec(plan, jnp.asarray(x), proc,
                            vp_receiver=jnp.asarray(vp), interpret=True))
    est = np.sum(x[s0] * vp[r0], axis=1)
    p = x[s0] * (v - est)[:, None]
    expect = np.zeros((plan.n_pad, x.shape[1]))
    np.add.at(expect, r0, p.astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=2e-3, atol=2e-3)


def test_vec_edge_value_scale():
    e, s0, r0, v, plan, x, vp = setup(k=4, seed=9)
    y = np.asarray(spmv_vec(plan, jnp.asarray(x),
                            lambda xv, ev, vpr, extra, rid: xv * ev, interpret=True))
    expect = np.zeros((plan.n_pad, 4))
    np.add.at(expect, r0, (x[s0] * v[:, None]).astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-3, atol=1e-3)


def test_vec_extra_operand():
    import jax.numpy as jnp
    e, s0, r0, v, plan, x, vp = setup(k=4, seed=11)
    extra = jnp.asarray(np.arange(4, dtype=np.float32) + 1.0)

    def proc(xv, ev, vpr, ex, rid):
        scale = ex[0:1, 0:4].reshape(4, 1)
        return xv * scale

    y = np.asarray(spmv_vec(plan, jnp.asarray(x), proc, extra=extra,
                            interpret=True))
    expect = np.zeros((plan.n_pad, 4))
    np.add.at(expect, r0, (x[s0] * (np.arange(4) + 1.0)).astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-3, atol=1e-3)


def test_engine_vec_sgd_matches_xla():
    """Full SGD through the engine's vector Pallas path (interpret)."""
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.sgd import SGDProgram, init_sgd_graph
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.io.edgelist import load_edgelist
    e = load_edgelist("data/ratings7.bin.mtx")

    g1 = Graph(e)
    init_sgd_graph(g1, k=8)
    g1.set_all_active()
    Engine(SGDProgram(step=0.001, k=8), g1, use_pallas=False).run(iterations=4)
    ref = g1.vp_numpy()["lv"]

    g2 = Graph(e)
    init_sgd_graph(g2, k=8)
    g2.set_all_active()
    prog = SGDProgram(step=0.001, k=8)
    prog.pallas_vec2_semiring = lambda: None   # pin the v1 vec path
    eng = Engine(prog, g2, use_pallas=True)
    assert eng.use_pallas_vec
    eng.run(iterations=4)
    out = g2.vp_numpy()["lv"]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_engine_vec_rmse_matches_xla():
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.sgd import rmse_per_edge, init_sgd_graph
    from graphmat_tpu.io.edgelist import load_edgelist
    import graphmat_tpu.core.runtime as rt
    e = load_edgelist("data/ratings7.bin.mtx")
    g1 = Graph(e)
    init_sgd_graph(g1, k=8)
    r_ref = rmse_per_edge(g1, k=8)

    # force pallas-vec through Engine by monkeypatching backend check
    g2 = Graph(e)
    init_sgd_graph(g2, k=8)
    from graphmat_tpu.apps.sgd import RMSEProgram
    from graphmat_tpu.core.runtime import Engine
    g2.set_all_active()
    Engine(RMSEProgram(k=8), g2, use_pallas=True).run(iterations=1)
    import math
    r_vec = math.sqrt(float(g2.vp_numpy()["sqerr"].sum()) / g2.nnz)
    assert abs(r_vec - r_ref) < 1e-3


def test_engine_vec_lda_matches_xla():
    """LDA init + iterations through the vector Pallas path (interpret)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ml_apps import bipartite_edges
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.lda import run_lda
    from graphmat_tpu.core import runtime as rt

    ndoc, nterms, k = 5, 7, 4
    e = bipartite_edges(ndoc, nterms, seed=31)

    g1 = Graph(e)
    N1, gN1, ll1 = run_lda(g1, ndoc, nterms, k=k, iterations=3)

    # run again forcing the vec path through every engine
    orig_init = rt.Engine.__init__
    def patched(self, program, graph, ctx=None, use_pallas=None):
        if use_pallas is None and program.pallas_vec_semiring() is not None:
            use_pallas = True
        orig_init(self, program, graph, ctx=ctx, use_pallas=use_pallas)
    rt.Engine.__init__ = patched
    try:
        g2 = Graph(e)
        N2, gN2, ll2 = run_lda(g2, ndoc, nterms, k=k, iterations=3)
    finally:
        rt.Engine.__init__ = orig_init
    np.testing.assert_allclose(N2, N1, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(gN2, gN1, rtol=3e-4)


def test_graphmat_debug_validates_vec2_plan(monkeypatch):
    """GRAPHMAT_DEBUG=1 runs plan-invariant validation at build time."""
    import numpy as np
    from graphmat_tpu.ops.pallas_spmv_vec2 import build_spmv_vec2_plan
    from graphmat_tpu.utils.debug import validate_planv
    monkeypatch.setenv("GRAPHMAT_DEBUG", "1")
    rng = np.random.default_rng(7)
    n, e = 3000, 20000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    v = rng.standard_normal(e).astype(np.float32)
    plan = build_spmv_vec2_plan(s, r, v, n)   # validates internally
    validate_planv(plan)
    # corruption is caught
    bad = plan
    object.__setattr__(bad, "nnz", plan.nnz + 1)
    try:
        validate_planv(bad)
    except AssertionError:
        pass
    else:
        raise AssertionError("corrupted plan passed validation")


def test_vec2_k40_planes_match_numpy():
    """K=40 runs two stacked 32-lane planes through ONE shared vec2
    plan; the SGD dot couples planes inside the kernel (round 5)."""
    from graphmat_tpu.ops.pallas_spmv_vec2 import (build_spmv_vec2_plan,
                                                   spmv_vec2)
    e = random_edgelist(300, 5, seed=13, weight_range=5)
    s0, r0, v = e.src - 1, e.dst - 1, e.val
    n = max(e.m, e.n)
    plan = build_spmv_vec2_plan(s0, r0, v, n)
    k = 40
    rng = np.random.default_rng(5)
    x = rng.standard_normal((n, k)).astype(np.float32)
    vp = rng.standard_normal((n, k)).astype(np.float32)

    def proc(xvs, ev, vprs, extra, rid, block_sum):
        est = sum(block_sum(a * b) for a, b in zip(xvs, vprs))
        return [a * (ev - est) for a in xvs]

    y = np.asarray(spmv_vec2(plan, jnp.asarray(x), proc, jnp.asarray(vp),
                             interpret=True))
    assert y.shape[1] == 64
    est = np.sum(x[s0].astype(np.float64) * vp[r0], axis=1)
    p = x[s0] * (v - est)[:, None]
    expect = np.zeros((plan.n_pad, k))
    np.add.at(expect, r0, p)
    np.testing.assert_allclose(y[: plan.n_pad, :k], expect, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(y[:, k:], 0.0, atol=1e-6)


def test_engine_vec2_k40_sgd_matches_xla():
    """Full K=40 SGD through the engine's vec2 K-plane path."""
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.sgd import SGDProgram, init_sgd_graph
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.io.edgelist import load_edgelist
    e = load_edgelist("data/ratings7.bin.mtx")

    def run(use_pallas):
        g = Graph(e)
        init_sgd_graph(g, k=40)
        g.set_all_active()
        eng = Engine(SGDProgram(step=0.001, k=40), g,
                     use_pallas=use_pallas)
        if use_pallas:
            assert eng.use_pallas_vec2
        eng.run(iterations=4)
        return g.vp_numpy()["lv"]

    np.testing.assert_allclose(run(True), run(False), rtol=2e-4,
                               atol=2e-4)


def test_engine_vec2_k40_lda_matches_xla():
    """K=40 LDA (init + 2 iterations + the K+1 is_doc flag plane)
    through the vec2 K-plane path vs the XLA engine."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ml_apps import bipartite_edges
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.lda import run_lda

    from graphmat_tpu.core import runtime as rt

    ndoc, nterms, k = 5, 7, 40
    e = bipartite_edges(ndoc, nterms, seed=23)
    N1, gN1, ll1 = run_lda(Graph(e), ndoc, nterms, k=k, iterations=2)

    orig_init = rt.Engine.__init__

    def patched(self, program, graph, ctx=None, use_pallas=None):
        if use_pallas is None and \
                program.pallas_vec2_semiring() is not None:
            use_pallas = True
        orig_init(self, program, graph, ctx=ctx, use_pallas=use_pallas)
    rt.Engine.__init__ = patched
    try:
        N2, gN2, ll2 = run_lda(Graph(e), ndoc, nterms, k=k, iterations=2)
    finally:
        rt.Engine.__init__ = orig_init
    np.testing.assert_allclose(N2, N1, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(gN2, gN1, rtol=3e-4)
    assert abs(ll2 - ll1) < 1e-2 * max(1.0, abs(ll1))


def test_vec_v1_vmem_guard_falls_back():
    """An ACTIVE_ONLY K-wide program whose v1 operand would exceed the
    scoped-VMEM budget must fall back to the XLA path with a warning
    instead of a compile-time OOM (PERF round 5j: 64 MB at 10M x K=20)."""
    import warnings

    from graphmat_tpu import Graph
    from graphmat_tpu.apps.sgd import RMSEProgram
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.core.types import Activity
    from graphmat_tpu.io.edgelist import EdgeList

    n = 200_100                      # n_pad * 4 * k ~ 16 MB > 14 MB
    src = np.arange(1, 201, dtype=np.int64)
    dst = np.arange(2, 202, dtype=np.int64)
    e = EdgeList(src=src, dst=dst, val=np.ones(200), m=n, n=n)
    g = Graph(e, build_in_edges=True)

    class BigVecOnly(RMSEProgram):
        activity = Activity.ACTIVE_ONLY   # disqualifies vec2

        def pallas_vec2_semiring(self):
            return None

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng = Engine(BigVecOnly(k=20), g)
    assert not eng.use_pallas_vec
    assert any("VMEM budget" in str(x.message) for x in w), \
        [str(x.message) for x in w]


def test_vec2_compact_matches_direct():
    """Hypersparse vec2 compaction (round 5k): forced-on divert must
    reproduce the direct plan bit-for-bit through the SGD ⊗ (virtual
    compact rows are exact copies of the source vectors; reference
    analog: any-K payloads staying dense per partition,
    multinode/spmspv3.h:41-267)."""
    from graphmat_tpu.ops.pallas_spmv_vec2 import (build_spmv_vec2_plan,
                                                   spmv_vec2)
    rng = np.random.default_rng(21)
    n, e = 4_000, 2_500              # ~0.6 edges/vertex: hypersparse
    s0 = rng.integers(0, n, e)
    r0 = rng.integers(0, n, e)
    v = rng.standard_normal(e).astype(np.float32)
    k = 8
    x = rng.standard_normal((n, k)).astype(np.float32)
    vp = rng.standard_normal((n, k)).astype(np.float32)

    def proc(xv, ev, vpr, extra, rid, block_sum):
        est = block_sum(xv * vpr)
        return xv * (ev - est)

    kw = dict(windows=(64, 256), compact_kw=dict(w_aux=256))
    plan_d = build_spmv_vec2_plan(s0, r0, v, n, compact=False, **kw)
    assert plan_d.aux is None and plan_d.hs == plan_d.hs_src
    plan_c = build_spmv_vec2_plan(s0, r0, v, n, compact=True, **kw)
    assert plan_c.aux is not None, "nothing diverted on a hypersparse graph"
    assert plan_c.hs == plan_c.hs_src + plan_c.aux.hc
    assert plan_c.n_send_pad == plan_d.n_send_pad  # SOURCE pack width
    y_d = np.asarray(spmv_vec2(plan_d, jnp.asarray(x), proc,
                               jnp.asarray(vp), interpret=True))
    y_c = np.asarray(spmv_vec2(plan_c, jnp.asarray(x), proc,
                               jnp.asarray(vp), interpret=True))
    est = np.sum(x[s0].astype(np.float64) * vp[r0], axis=1)
    expect = np.zeros((plan_d.n_pad, k))
    np.add.at(expect, r0, x[s0] * (v.astype(np.float64) - est)[:, None])
    np.testing.assert_allclose(y_d[:, :k], expect, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(y_c[:, :k], expect, rtol=2e-3, atol=2e-3)


def test_vec2_compact_k_planes_and_debug_validate(monkeypatch):
    """K=40 (two stacked planes) through a compacted plan: the aux
    gather runs per plane; GRAPHMAT_DEBUG plan validation holds on the
    extended-operand plan."""
    from graphmat_tpu.ops.pallas_spmv_vec2 import (build_spmv_vec2_plan,
                                                   spmv_vec2)
    monkeypatch.setenv("GRAPHMAT_DEBUG", "1")
    rng = np.random.default_rng(31)
    n, e = 3_000, 1_800
    s0 = rng.integers(0, n, e)
    r0 = rng.integers(0, n, e)
    v = rng.standard_normal(e).astype(np.float32)
    k = 40
    x = rng.standard_normal((n, k)).astype(np.float32)
    vp = rng.standard_normal((n, k)).astype(np.float32)
    plan = build_spmv_vec2_plan(s0, r0, v, n, compact=True,
                                windows=(64, 256),
                                compact_kw=dict(w_aux=256))
    assert plan.aux is not None

    def proc(xvs, ev, vprs, extra, rid, block_sum):
        est = sum(block_sum(a * b) for a, b in zip(xvs, vprs))
        return [a * (ev - est) for a in xvs]

    y = np.asarray(spmv_vec2(plan, jnp.asarray(x), proc,
                             jnp.asarray(vp), interpret=True))
    est = np.sum(x[s0].astype(np.float64) * vp[r0], axis=1)
    expect = np.zeros((plan.n_pad, k))
    np.add.at(expect, r0, x[s0] * (v.astype(np.float64) - est)[:, None])
    np.testing.assert_allclose(y[: plan.n_pad, :k], expect, rtol=2e-3,
                               atol=2e-3)
