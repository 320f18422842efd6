"""spmv2 (VPU-gather kernel) vs dense oracle, interpret mode on CPU."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from graphmat_tpu.ops.pallas_spmv2 import (CHUNK, build_spmv2_plan, spmv2)


def _rand_graph(rng, n, e, hubby=True):
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    if hubby:
        nh = e // 3
        s[:nh] = rng.integers(0, min(100, n), nh)
    v = rng.standard_normal(e).astype(np.float32)
    return s, r, v


@pytest.mark.parametrize("n,e", [(300, 2000), (5000, 40000)])
def test_spmv2_matches_oracle(n, e):
    rng = np.random.default_rng(0)
    s, r, v = _rand_graph(rng, n, e)
    plan = build_spmv2_plan(s, r, v, n, wr=512, windows=(16, 64),
                            cell_min=64)
    x = rng.standard_normal(n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2(plan, jnp.asarray(xp), "sum",
                         process=lambda xv, ev: xv * ev, interpret=True))
    ref = sp.csr_matrix((v, (r, s)), shape=(n, n)) @ x.astype(np.float64)
    assert np.allclose(y[:n], ref, rtol=2e-6, atol=1e-5)
    # receivers without edges hold the sum identity
    noin = np.setdiff1d(np.arange(n), r)
    assert (y[noin] == 0).all()


def test_spmv2_plan_invariants():
    rng = np.random.default_rng(1)
    n, e = 4000, 30000
    s, r, v = _rand_graph(rng, n, e)
    plan = build_spmv2_plan(s, r, v, n, wr=512, windows=(16, 64),
                            cell_min=64)
    blk = np.asarray(plan.blkid)
    assert (np.diff(blk) >= 0).all()
    # every receiver block appears (VMEM accumulator coverage)
    assert set(range(plan.nb)) == set(blk.tolist())
    assert plan.nnz == e
    assert 0 < plan.fill <= 1
    # slot conservation: every real edge value lands exactly once
    assert np.isclose(np.asarray(plan.val).sum(), v.sum(), rtol=1e-3)


def test_spmv2_custom_process_and_got():
    rng = np.random.default_rng(2)
    n, e = 1000, 8000
    s, r, v = _rand_graph(rng, n, e, hubby=False)
    plan = build_spmv2_plan(s, r, v, n, wr=512, windows=(16,), cell_min=32)
    x = np.abs(rng.standard_normal(n)).astype(np.float32) + 1.0
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    # process ignoring the edge value (pads must not contribute)
    y = np.asarray(spmv2(plan, jnp.asarray(xp), "sum",
                         process=lambda xv, ev: xv + 0.0 * ev,
                         interpret=True))
    ref = sp.csr_matrix((np.ones(e, np.float32), (r, s)),
                        shape=(n, n)) @ x.astype(np.float64)
    assert np.allclose(y[:n], ref, rtol=2e-6, atol=1e-5)
    got = np.asarray(plan.got_static)
    assert got[:n].sum() == len(np.unique(r))


def test_spmv2_empty_and_tiny():
    plan = build_spmv2_plan(np.zeros(0, np.int64), np.zeros(0, np.int64),
                            np.zeros(0, np.float32), 10)
    x = jnp.zeros(plan.n_send_pad, jnp.float32)
    y = np.asarray(spmv2(plan, x, "sum", interpret=True))
    assert (y == 0).all()
    # single edge
    plan = build_spmv2_plan(np.array([3]), np.array([7]),
                            np.array([2.0], np.float32), 10)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[3] = 5.0
    y = np.asarray(spmv2(plan, jnp.asarray(xp), "sum",
                         process=lambda xv, ev: xv * ev, interpret=True))
    assert y[7] == 10.0 and np.count_nonzero(y) == 1


def test_spmv2m_min_matches_oracle():
    rng = np.random.default_rng(5)
    n, e = 2000, 16000
    s = rng.integers(0, n, e).astype(np.int64)
    s[: e // 4] = rng.integers(0, min(100, n), e // 4)
    r = rng.integers(0, n, e).astype(np.int64)
    v = np.abs(rng.standard_normal(e)).astype(np.float32) + 0.1
    from graphmat_tpu.ops.pallas_spmv2 import build_spmv2m_plan, spmv2m
    plan = build_spmv2m_plan(s, r, v, n, wr=512, windows=(16, 64),
                             cell_min=64)
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2m(plan, jnp.asarray(xp), "min",
                          process=lambda xv, ev: xv + ev, interpret=True))
    # oracle: y[r] = min over in-edges of x[s] + w
    ref = np.full(n, np.inf)
    np.minimum.at(ref, r, x[s] + v)
    got = np.isfinite(ref)
    assert np.allclose(y[:n][got], ref[got], rtol=1e-6)
    assert np.isinf(y[:n][~got]).all()


def test_spmv2m_max_matches_oracle():
    rng = np.random.default_rng(6)
    n, e = 700, 4000
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    v = rng.standard_normal(e).astype(np.float32)
    from graphmat_tpu.ops.pallas_spmv2 import build_spmv2m_plan, spmv2m
    plan = build_spmv2m_plan(s, r, v, n, wr=512, windows=(16,), cell_min=32)
    x = rng.standard_normal(n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2m(plan, jnp.asarray(xp), "max",
                          process=lambda xv, ev: xv * ev, interpret=True))
    ref = np.full(n, -np.inf)
    np.maximum.at(ref, r, x[s] * v)
    got = np.isfinite(ref)
    assert np.allclose(y[:n][got], ref[got], rtol=1e-6)


def test_spmv2m_hot_receiver_rowmode():
    """An in-degree hub must not explode the chunk count (row-mode)."""
    rng = np.random.default_rng(7)
    n, e = 3000, 24000
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    r[: e // 2] = 7             # hot receiver: 12K in-edges
    v = np.abs(rng.standard_normal(e)).astype(np.float32) + 0.1
    from graphmat_tpu.ops.pallas_spmv2 import build_spmv2m_plan, spmv2m
    plan = build_spmv2m_plan(s, r, v, n, wr=512, windows=(16, 64),
                             cell_min=64)
    assert plan.fill > 0.25, plan.fill   # without row-mode this is ~0.01
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2m(plan, jnp.asarray(xp), "min",
                          process=lambda xv, ev: xv + ev, interpret=True))
    ref = np.full(n, np.inf)
    np.minimum.at(ref, r, x[s] + v)
    got = np.isfinite(ref)
    assert np.allclose(y[:n][got], ref[got], rtol=1e-6)


def test_spmv2_rows32_matches_oracle():
    rng = np.random.default_rng(9)
    n, e = 4000, 50000
    s = rng.integers(0, n, e).astype(np.int64)
    s[: e // 3] = rng.integers(0, 100, e // 3)
    r = rng.integers(0, n, e).astype(np.int64)
    v = rng.standard_normal(e).astype(np.float32)
    plan = build_spmv2_plan(s, r, v, n, wr=512, windows=(16, 64),
                            cell_min=64, rows=32)
    assert plan.rows == 32 and plan.pk.shape[1] == 32
    x = rng.standard_normal(n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2(plan, jnp.asarray(xp), "sum",
                         process=lambda xv, ev: xv * ev, interpret=True))
    ref = sp.csr_matrix((v, (r, s)), shape=(n, n)) @ x.astype(np.float64)
    assert np.allclose(y[:n], ref, rtol=2e-6, atol=1e-5)


@pytest.mark.parametrize("native", [False, None], ids=["numpy", "native"])
def test_spmv2_routed_lane_skew(native, monkeypatch):
    """Adversarial sender-lane skew: all senders share one lane (s % 128
    equal).  The routed layout must keep fill high (the lane-bound layout
    collapsed to ~1/128) and match the oracle; GRAPHMAT_DEBUG validates
    the packed-plane invariants for both planners."""
    from graphmat_tpu.native import native_available
    if native is None and not native_available():
        pytest.skip("no native planner")
    monkeypatch.setenv("GRAPHMAT_DEBUG", "1")
    import graphmat_tpu.native as gmn
    if native is False:
        monkeypatch.setattr(gmn, "_lib", None)
        monkeypatch.setattr(gmn, "_tried", True)
    rng = np.random.default_rng(21)
    n, e = 6000, 60000
    s = (rng.integers(0, n // 128, e).astype(np.int64)) * 128 + 5
    r = rng.integers(0, n, e).astype(np.int64)
    v = rng.standard_normal(e).astype(np.float32)
    plan = build_spmv2_plan(s, r, v, n, wr=2048, hub=512,
                            windows=(16, 64), cell_min=64)
    assert plan.fill > 0.4, plan.fill
    x = rng.standard_normal(n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2(plan, jnp.asarray(xp), "sum",
                         process=lambda xv, ev: xv * ev, interpret=True))
    ref = sp.csr_matrix((v, (r, s)), shape=(n, n)) @ x.astype(np.float64)
    assert np.allclose(y[:n], ref, rtol=2e-6, atol=1e-5)


def test_spmv2_sparse_frontier_matches_dense():
    """Chunk-skip fast path: with inactive senders carrying 0 in x, the
    skipped result is bit-identical to the dense sweep (skipping removes
    only exact zeros from the sums)."""
    rng = np.random.default_rng(11)
    n, e = 5000, 60000
    s, r, v = _rand_graph(rng, n, e)
    plan = build_spmv2_plan(s, r, v, n, wr=1024, hub=512,
                            windows=(64, 256), cell_min=100)
    for density in (0.0, 0.03, 1.0):
        act = rng.random(plan.n_send_pad) < density
        x = np.where(act, rng.standard_normal(plan.n_send_pad),
                     0.0).astype(np.float32)
        y_dense = np.asarray(spmv2(plan, jnp.asarray(x), "sum",
                                   process=lambda xv, ev: xv * ev,
                                   interpret=True))
        y_sparse = np.asarray(spmv2(plan, jnp.asarray(x), "sum",
                                    process=lambda xv, ev: xv * ev,
                                    interpret=True,
                                    sent=jnp.asarray(act)))
        assert np.array_equal(y_dense, y_sparse), density


def test_spmv2_with_got_fused():
    """The fused got plane (activity bit on x's low mantissa bit) must
    return got equal to the exact per-receiver frontier oracle, and y
    within 1 ulp per term of the plain masked call (the bit steals the
    low mantissa bit of each active x) — for empty, sparse, and full
    frontiers.  Integer payloads stay exact."""
    rng = np.random.default_rng(13)
    n, e = 5000, 60000
    s, r, v = _rand_graph(rng, n, e)
    plan = build_spmv2_plan(s, r, v, n, wr=1024, hub=512,
                            windows=(64, 256), cell_min=100)
    proc = lambda xv, ev: xv * ev
    for density in (0.0, 0.03, 1.0):
        act = rng.random(plan.n_send_pad) < density
        x = np.where(act, rng.standard_normal(plan.n_send_pad),
                     0.0).astype(np.float32)
        y_plain = np.asarray(spmv2(plan, jnp.asarray(x), "sum",
                                   process=proc, interpret=True,
                                   sent=jnp.asarray(act)))
        y_got, got = spmv2(plan, jnp.asarray(x), "sum", process=proc,
                           interpret=True, sent=jnp.asarray(act),
                           with_got=True)
        assert np.allclose(np.asarray(y_got), y_plain,
                           rtol=3e-6, atol=3e-6), density
        # oracle got: receiver heard from >= 1 active sender
        om = np.zeros(plan.n_pad, bool)
        om[r[act[s]]] = True
        assert np.array_equal(np.asarray(got), om), density
    # integer payloads (TopoSort-style count messages) stay exact
    act = rng.random(plan.n_send_pad) < 0.2
    xi = np.where(act, rng.integers(1, 1000, plan.n_send_pad),
                  0).astype(np.float32)
    y_plain = np.asarray(spmv2(plan, jnp.asarray(xi), "sum",
                               process=lambda xv, ev: xv, interpret=True,
                               sent=jnp.asarray(act)))
    y_got, got = spmv2(plan, jnp.asarray(xi), "sum",
                       process=lambda xv, ev: xv, interpret=True,
                       sent=jnp.asarray(act), with_got=True)
    assert np.array_equal(np.asarray(y_got), y_plain)


def test_spmv2m_sparse_frontier_matches_dense():
    from graphmat_tpu.ops.pallas_spmv2 import build_spmv2m_plan, spmv2m
    BIG = 1e30
    rng = np.random.default_rng(12)
    n, e = 5000, 60000
    s, r, v = _rand_graph(rng, n, e)
    plan = build_spmv2m_plan(s, r, v, n, wr=1024, hub=512,
                             windows=(64, 256), cell_min=100)
    for density in (0.0, 0.03, 1.0):
        act = rng.random(plan.n_send_pad) < density
        x = np.where(act, rng.standard_normal(plan.n_send_pad),
                     BIG).astype(np.float32)
        y_dense = np.asarray(spmv2m(plan, jnp.asarray(x), "min",
                                    process=lambda xv, ev: xv + ev,
                                    interpret=True))
        y_sparse = np.asarray(spmv2m(plan, jnp.asarray(x), "min",
                                     process=lambda xv, ev: xv + ev,
                                     interpret=True,
                                     sent=jnp.asarray(act)))
        # skipped chunks yield the true identity (inf) where the dense
        # sweep yields ~BIG; after the engine's sentinel threshold the
        # two agree everywhere
        got_d = y_dense < BIG / 2
        got_s = y_sparse < BIG / 2
        assert np.array_equal(got_d, got_s), density
        assert np.array_equal(y_dense[got_d], y_sparse[got_d]), density
        # oracle on the active edges
        om = np.full(plan.n_pad, np.inf)
        aedge = act[s]
        np.minimum.at(om, r[aedge], x[s[aedge]] + v[aedge])
        assert np.allclose(y_sparse[got_s], om[got_s], rtol=1e-6)


def test_engine_or_semiring_rides_max_layout():
    """reduce_kind='or' maps onto the max kernel layout ('any' onto min)
    — no silent drop to the XLA path (VERDICT: generic-monoid guardrail;
    reference kernels accept any op_add, singlenode/spmspv.h:226-314)."""
    import jax.numpy as jnp
    from graphmat_tpu import Graph
    from graphmat_tpu.core.program import GraphProgram, PallasSemiring
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.core.types import Activity, Direction, LOR
    from graphmat_tpu.io.edgelist import edgelist_from_arrays

    class Reach(GraphProgram):
        order = Direction.OUT_EDGES
        activity = Activity.ACTIVE_ONLY
        reduce = LOR
        process_requires_vertexprop = False

        def send_message(self, state, vp):
            return vp["r"], None

        def process_message(self, state, msg, ev, vpr):
            return msg

        def apply(self, state, reduced, vp):
            return {"r": vp["r"] | reduced}

        def pallas_semiring(self):
            return PallasSemiring(
                "or", encode=lambda m: m.astype(jnp.float32),
                decode=lambda y: y > 0.5, uses_edge_value=False)

    n = 50
    src = np.arange(1, n, dtype=np.int64)
    e = edgelist_from_arrays(src, src + 1, np.ones(n - 1, np.int32))

    def run(use_pallas):
        g = Graph(e)
        g.init_vertexproperty(r=np.zeros(n, bool))
        g.set_vertexproperty(1, r=True)
        g.set_all_inactive()
        g.set_active(1)
        eng = Engine(Reach(), g, use_pallas=use_pallas)
        if use_pallas:
            assert eng._semiring.reduce_kind == "max"
        eng.run()
        return g.vp_numpy()["r"]

    np.testing.assert_array_equal(run(True), run(False))
    assert run(True).all()


def test_slow_path_warns_on_tpu(monkeypatch):
    """A program with no Pallas semiring on a TPU backend warns loudly
    about the ~10,000x XLA segment-path penalty."""
    import warnings
    import jax
    from graphmat_tpu import Graph
    from graphmat_tpu.core import runtime as rt
    from graphmat_tpu.core.program import GraphProgram
    from graphmat_tpu.core.types import Direction
    from graphmat_tpu.utils.generators import random_edgelist

    class NoSem(GraphProgram):
        order = Direction.OUT_EDGES

        def send_message(self, state, vp):
            return vp["x"], None

        def process_message(self, state, msg, ev, vpr):
            return msg

        def apply(self, state, reduced, vp):
            return {"x": reduced}

    g = Graph(random_edgelist(20, 2, seed=1))
    g.init_vertexproperty(x=np.zeros(20, np.float32))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("GRAPHMAT_SILENCE_SLOW_PATH", raising=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        try:
            rt.Engine(NoSem(), g, use_pallas=False)
        except Exception:
            pass
        assert any("10,000x" in str(x.message) for x in w)
    monkeypatch.setenv("GRAPHMAT_SILENCE_SLOW_PATH", "1")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        try:
            rt.Engine(NoSem(), g, use_pallas=False)
        except Exception:
            pass
        assert not any("10,000x" in str(x.message) for x in w)


@pytest.mark.parametrize("native", [False, None], ids=["numpy", "native"])
def test_spmv2m_lane_skew(native, monkeypatch):
    """Adversarial two-sided skew for the min layout: senders share one
    lane AND one receiver is hot.  The Koenig-colored native planner and
    the greedy python fallback must both stay correct (fill differs);
    GRAPHMAT_DEBUG validates plan invariants."""
    from graphmat_tpu.native import native_available
    if native is None and not native_available():
        pytest.skip("no native planner")
    monkeypatch.setenv("GRAPHMAT_DEBUG", "1")
    import graphmat_tpu.native as gmn
    if native is False:
        monkeypatch.setattr(gmn, "_lib", None)
        monkeypatch.setattr(gmn, "_tried", True)
    from graphmat_tpu.ops.pallas_spmv2 import build_spmv2m_plan, spmv2m
    rng = np.random.default_rng(31)
    n, e = 4000, 40000
    s = (rng.integers(0, n // 128, e).astype(np.int64)) * 128 + 9
    r = rng.integers(0, n, e).astype(np.int64)
    r[: e // 4] = 513          # hot receiver (row-mode territory)
    v = np.abs(rng.standard_normal(e)).astype(np.float32) + 0.1
    plan = build_spmv2m_plan(s, r, v, n, wr=2048, hub=512,
                             windows=(16, 64), cell_min=64)
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2m(plan, jnp.asarray(xp), "min",
                          process=lambda xv, ev: xv + ev, interpret=True))
    ref = np.full(n, np.inf)
    np.minimum.at(ref, r, x[s] + v)
    got = np.isfinite(ref)
    assert np.allclose(y[:n][got], ref[got], rtol=1e-6)
    assert np.isinf(y[:n][~got]).all()
