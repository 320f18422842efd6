"""Oracle tests for the unified v2u Pallas layout (interpret mode, CPU).

Mirrors the reference's SpMV identity/oracle tests
(``test/test_spmv.cpp:38-103``) across all three reduce kinds on ONE
plan, plus the v2u-specific machinery: row-mode hot receivers, the
sparse-frontier chunk skip, the fused got bitvector, and the in-place
val refresh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphmat_tpu.ops.pallas_spmv2u import (build_spmv2u_plan,
                                            refresh_plan2u_vals, spmv2u)

os.environ.setdefault("GRAPHMAT_DEBUG", "1")


def _rand_graph(n, e, seed, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # zipf-ish senders/receivers to hit hubs and row-mode
        s = np.minimum((rng.pareto(1.0, e) * 3).astype(np.int64), n - 1)
        r = np.minimum((rng.pareto(1.2, e) * 5).astype(np.int64), n - 1)
    else:
        s = rng.integers(0, n, e)
        r = rng.integers(0, n, e)
    v = rng.normal(size=e).astype(np.float32)
    return s.astype(np.int64), r.astype(np.int64), v


def _oracle(s, r, v, x, n, kind, process):
    if kind == "sum":
        y = np.zeros(n, np.float64)
        np.add.at(y, r, process(x[s], v).astype(np.float64))
        return y
    y = np.full(n, np.inf if kind == "min" else -np.inf, np.float64)
    f = np.minimum if kind == "min" else np.maximum
    vals = process(x[s], v)
    for i in range(len(s)):
        y[r[i]] = f(y[r[i]], vals[i])
    return y


@pytest.mark.parametrize("kind", ["sum", "min", "max"])
@pytest.mark.parametrize("skew", [False, True])
def test_spmv2u_matches_oracle(kind, skew):
    n, e = 1500, 12000
    s, r, v = _rand_graph(n, e, seed=3 + skew, skew=skew)
    plan = build_spmv2u_plan(s, r, v, n, wr=512, windows=(16, 64),
                             cell_min=64, rows=32, hub=128)
    x = np.arange(n, dtype=np.float32) * 0.25 + 1.0
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    proc = lambda xv, ev: xv * ev
    y = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                          process=proc, interpret=True))[:n]
    ref = _oracle(s, r, v, x, n, kind, lambda a, b: a * b)
    m = np.isfinite(ref)
    np.testing.assert_allclose(y[m], ref[m], rtol=1e-4, atol=1e-4)
    if kind != "sum":
        assert not np.isfinite(y[~m]).any() or (~m).sum() == 0


def test_spmv2u_one_plan_serves_all_kinds():
    n, e = 800, 6000
    s, r, v = _rand_graph(n, e, seed=11)
    plan = build_spmv2u_plan(s, r, v, n, wr=512, windows=(16,),
                             cell_min=48, rows=32, hub=128)
    x = np.linspace(0.5, 2.0, n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    for kind in ("sum", "min", "max"):
        y = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                              interpret=True))[:n]
        ref = _oracle(s, r, v, x, n, kind, lambda a, b: a)
        m = np.isfinite(ref)
        np.testing.assert_allclose(y[m], ref[m], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_hot_receiver_rowmode(kind):
    # one receiver with in-cell degree >> rowmode_min plus background
    rng = np.random.default_rng(7)
    n, e = 1200, 9000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    s2 = rng.integers(0, n, 700)
    r2 = np.full(700, 37)
    s_, r_ = np.r_[s, s2], np.r_[r, r2]
    v_ = rng.normal(size=len(s_)).astype(np.float32)
    plan = build_spmv2u_plan(s_, r_, v_, n, wr=512, windows=(16, 64),
                             cell_min=64, rows=32, hub=128,
                             rowmode_min=65)
    x = rng.normal(size=n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                          interpret=True))[:n]
    ref = _oracle(s_, r_, v_, x, n, kind, lambda a, b: a)
    m = np.isfinite(ref)
    np.testing.assert_allclose(y[m], ref[m], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_sparse_frontier_matches_dense(kind):
    n, e = 1400, 10000
    s, r, v = _rand_graph(n, e, seed=5)
    plan = build_spmv2u_plan(s, r, v, n, wr=512, windows=(16, 64),
                             cell_min=64, rows=32, hub=128)
    rng = np.random.default_rng(0)
    BIG = np.float32(3.0e38)
    fillv = 0.0 if kind == "sum" else (BIG if kind == "min" else -BIG)
    for frac in (0.02, 0.5):
        active = rng.random(n) < frac
        x = np.where(active, rng.normal(size=n).astype(np.float32),
                     np.float32(fillv))
        xp = np.full(plan.n_send_pad, np.float32(fillv), np.float32)
        xp[:n] = x
        sent = np.zeros(plan.n_send_pad, bool)
        sent[:n] = active
        y_dense = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                                    interpret=True))[:n]
        y_sparse = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                                     sent=jnp.asarray(sent),
                                     interpret=True))[:n]
        np.testing.assert_allclose(y_sparse, y_dense, rtol=1e-6)


def test_spmv2u_got_fused():
    n, e = 1000, 8000
    s, r, v = _rand_graph(n, e, seed=9)
    plan = build_spmv2u_plan(s, r, v, n, wr=512, windows=(16, 64),
                             cell_min=64, rows=32, hub=128,
                             rowmode_min=65)
    rng = np.random.default_rng(1)
    active = rng.random(n) < 0.3
    x = np.where(active, rng.normal(size=n).astype(np.float32), 0.0)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    sent = np.zeros(plan.n_send_pad, bool)
    sent[:n] = active
    y, got = spmv2u(plan, jnp.asarray(xp), "sum",
                    sent=jnp.asarray(sent), with_got=True,
                    interpret=True)
    y, got = np.asarray(y)[:n], np.asarray(got)[:n]
    ref_got = np.zeros(n, bool)
    am = active[s]
    np.logical_or.at(ref_got, r[am], True)
    np.testing.assert_array_equal(got, ref_got)
    ref = np.zeros(n, np.float64)
    np.add.at(ref, r[am], x[s[am]].astype(np.float64))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_spmv2u_empty_and_single_edge():
    plan = build_spmv2u_plan(np.zeros(0, np.int64), np.zeros(0, np.int64),
                             np.zeros(0, np.float32), 300, wr=512,
                             windows=(16,), cell_min=8, rows=32)
    x = jnp.ones(plan.n_send_pad, jnp.float32)
    y = np.asarray(spmv2u(plan, x, "sum", interpret=True))
    assert (y[:300] == 0).all()

    plan = build_spmv2u_plan(np.array([3]), np.array([7]),
                             np.array([2.5], np.float32), 300, wr=512,
                             windows=(16,), cell_min=8, rows=32)
    y = np.asarray(spmv2u(plan, x, "sum",
                          process=lambda a, b: a * b, interpret=True))
    assert y[7] == pytest.approx(2.5)
    assert (np.delete(y[:300], 7) == 0).all()


def test_spmv2u_val_refresh():
    n, e = 600, 4000
    s, r, v = _rand_graph(n, e, seed=13)
    plan = build_spmv2u_plan(s, r, v, n, wr=512, windows=(16,),
                             cell_min=48, rows=32)
    x = np.ones(plan.n_send_pad, np.float32)
    v2 = (v * 3 + 1).astype(np.float32)
    assert refresh_plan2u_vals(plan, v2)
    y = np.asarray(spmv2u(plan, jnp.asarray(x), "sum",
                          process=lambda a, b: a * b, interpret=True))[:n]
    ref = _oracle(s, r, v2, np.ones(n, np.float32), n, "sum",
                  lambda a, b: a * b)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_segmented_grid_matches(kind):
    """Grids beyond the SMEM scalar budget split into multiple
    pallas_calls at block boundaries; forcing tiny segments must give
    identical results (dense + sparse + got)."""
    from graphmat_tpu.ops.pallas_spmv2u import (_apply_splits,
                                                _compute_splits)
    n, e = 1800, 14000
    s, r, v = _rand_graph(n, e, seed=21)
    plan = build_spmv2u_plan(s, r, v, n, wr=256, windows=(16, 64),
                             cell_min=64, rows=32, hub=128)
    assert plan.nb >= 4
    x = np.linspace(0.5, 2.0, n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y_one = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                              interpret=True))[:n]
    plan.splits = _compute_splits(np.asarray(plan.blkid), plan.nb,
                                  nc_seg=max(plan.nc // 3, 2))
    assert len(plan.splits) >= 2
    _apply_splits(plan)   # segmented plans store per-segment arrays
    y_seg = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                              interpret=True))[:n]
    np.testing.assert_array_equal(y_one, y_seg)
    # sparse + got through the segmented path
    rng = np.random.default_rng(2)
    active = rng.random(n) < 0.3
    if kind == "sum":
        xs = np.where(active, x, 0.0).astype(np.float32)
        xp2 = np.zeros(plan.n_send_pad, np.float32)
        xp2[:n] = xs
        sent = np.zeros(plan.n_send_pad, bool)
        sent[:n] = active
        y, got = spmv2u(plan, jnp.asarray(xp2), "sum",
                        sent=jnp.asarray(sent), with_got=True,
                        interpret=True)
        ref_got = np.zeros(n, bool)
        am = active[s]
        np.logical_or.at(ref_got, r[am], True)
        np.testing.assert_array_equal(np.asarray(got)[:n], ref_got)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_quad_subwindow_chunks(kind):
    """rows=128 chunks carry four 32-row sub-windows (the production
    shape); oracle match incl. window-reuse chain and sparse skip."""
    n, e = 2500, 30000
    s, r, v = _rand_graph(n, e, seed=31, skew=True)
    plan = build_spmv2u_plan(s, r, v, n, wr=512, windows=(16, 64),
                             cell_min=64, rows=128, hub=128)
    assert plan.rows == 128
    x = np.arange(n, dtype=np.float32) * 0.125 + 1.0
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                          interpret=True))[:n]
    ref = _oracle(s, r, v, x, n, kind, lambda a, b: a)
    m = np.isfinite(ref)
    np.testing.assert_allclose(y[m], ref[m], rtol=1e-4, atol=1e-4)
    # sparse path on the quad shape
    rng = np.random.default_rng(3)
    BIG = np.float32(3.0e38)
    fillv = 0.0 if kind == "sum" else BIG
    active = rng.random(n) < 0.1
    x2 = np.where(active, x, np.float32(fillv))
    xp2 = np.full(plan.n_send_pad, np.float32(fillv), np.float32)
    xp2[:n] = x2
    sent = np.zeros(plan.n_send_pad, bool)
    sent[:n] = active
    y_d = np.asarray(spmv2u(plan, jnp.asarray(xp2), kind,
                            interpret=True))[:n]
    y_s = np.asarray(spmv2u(plan, jnp.asarray(xp2), kind,
                            sent=jnp.asarray(sent), interpret=True))[:n]
    np.testing.assert_allclose(y_s, y_d, rtol=1e-6)


def test_graph_plan2u_wr_knob(monkeypatch):
    """pallas_plan2u picks wr=4096 by default and honors GRAPHMAT_WR
    (wider receiver blocks halve sender-window re-reads at scale)."""
    from graphmat_tpu.core.graph import Graph
    from graphmat_tpu.io.edgelist import edgelist_from_arrays
    e = edgelist_from_arrays([1, 2, 3, 4], [2, 3, 4, 1], m=600, n=600)
    g = Graph(e, build_in_edges=False)
    assert g.pallas_plan2u("dst").wr == 4096
    monkeypatch.setenv("GRAPHMAT_WR", "1024")
    g2 = Graph(e, build_in_edges=False)
    assert g2.pallas_plan2u("dst").wr == 1024

def test_graph_plan2u_wr_knob_validated(monkeypatch):
    """A GRAPHMAT_WR that is not a multiple of 128 (or out of rcf range)
    must fail at the knob with a clear message, not deep in a Mosaic
    trace (v2u binds out-lanes as rcf & 127 == r & 127)."""
    import pytest
    from graphmat_tpu.core.graph import Graph
    from graphmat_tpu.io.edgelist import edgelist_from_arrays
    e = edgelist_from_arrays([1, 2], [2, 1], m=300, n=300)
    g = Graph(e, build_in_edges=False)
    monkeypatch.setenv("GRAPHMAT_WR", "1000")
    with pytest.raises(ValueError, match="GRAPHMAT_WR"):
        g.pallas_plan2u("dst")
    monkeypatch.setenv("GRAPHMAT_WR", "1048576")
    with pytest.raises(ValueError, match="GRAPHMAT_WR"):
        g.pallas_plan2u("dst")


def test_kernel_env_knob_validated(monkeypatch):
    """GRAPHMAT_KERNEL accepts only 'v2u'/'v2'; a typo must raise rather
    than silently selecting the default kernel during triage."""
    import pytest
    from graphmat_tpu.core.runtime import legacy_kernel_env
    monkeypatch.delenv("GRAPHMAT_KERNEL", raising=False)
    assert legacy_kernel_env() is False
    monkeypatch.setenv("GRAPHMAT_KERNEL", "v2")
    assert legacy_kernel_env() is True
    monkeypatch.setenv("GRAPHMAT_KERNEL", "v2r")
    with pytest.raises(ValueError, match="GRAPHMAT_KERNEL"):
        legacy_kernel_env()


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_compaction_matches_oracle(kind):
    """Hypersparse compaction (the DCSC analog): straggler edges gather
    from aux-built virtual compact rows; results must be bit-identical
    to the uncompacted plan (the aux pass is a pure copy)."""
    n, e = 2200, 9000
    s, r, v = _rand_graph(n, e, seed=41, skew=True)
    kw = dict(wr=256, windows=(16, 64), cell_min=64, rows=32, hub=64)
    plan0 = build_spmv2u_plan(s, r, v, n, compact=False, **kw)
    plan = build_spmv2u_plan(
        s, r, v, n, compact=True,
        compact_kw=dict(divert_min=40, bpsb=2, w_div=64, w_aux=16), **kw)
    assert plan.aux is not None and plan.h > plan.h_src
    assert plan.n_send_pad == plan0.n_send_pad
    x = np.linspace(0.5, 2.0, n).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y0 = np.asarray(spmv2u(plan0, jnp.asarray(xp), kind,
                           process=lambda a, b: a * b, interpret=True))
    y1 = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                           process=lambda a, b: a * b, interpret=True))
    if kind == "sum":
        # same addends, possibly different order
        ref = _oracle(s, r, v, x, n, kind, lambda a, b: a * b)
        np.testing.assert_allclose(y1[:n], ref, rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_array_equal(y0, y1)


def test_spmv2u_compaction_sparse_and_got():
    """ACTIVE_ONLY path through a compacted plan: virtual rows are
    conservatively active; values/got must still match the oracle."""
    n, e = 1800, 7000
    s, r, v = _rand_graph(n, e, seed=43, skew=True)
    plan = build_spmv2u_plan(
        s, r, v, n, wr=256, windows=(16, 64), cell_min=64, rows=32,
        hub=64, compact=True,
        compact_kw=dict(divert_min=40, bpsb=2, w_div=64, w_aux=16))
    assert plan.aux is not None
    rng = np.random.default_rng(5)
    active = rng.random(n) < 0.25
    x = np.linspace(1.0, 3.0, n).astype(np.float32)
    xs = np.where(active, x, 0.0).astype(np.float32)
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = xs
    sent = np.zeros(plan.n_send_pad, bool)
    sent[:n] = active
    y, got = spmv2u(plan, jnp.asarray(xp), "sum",
                    sent=jnp.asarray(sent), with_got=True, interpret=True)
    am = active[s]
    ref = np.zeros(n, np.float64)
    np.add.at(ref, r[am], x[s[am]])
    ref_got = np.zeros(n, bool)
    np.logical_or.at(ref_got, r[am], True)
    np.testing.assert_allclose(np.asarray(y)[:n], ref, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got)[:n], ref_got)
    # min with edge values through the sparse path
    xm = np.where(active, x, np.float32(1e30))
    xp2 = np.zeros(plan.n_send_pad, np.float32)
    xp2[:n] = xm
    xp2[n:] = 1e30
    ym = np.asarray(spmv2u(plan, jnp.asarray(xp2), "min",
                           process=lambda a, b: a + b,
                           sent=jnp.asarray(sent), interpret=True))[:n]
    refm = np.full(n, np.inf)
    np.minimum.at(refm, r[am], x[s[am]] + v[am])
    m = np.isfinite(refm)
    np.testing.assert_allclose(ym[m], refm[m], rtol=1e-5)


def test_divert_stragglers_layout_invariants():
    """Virtual position map invariants: every diverted edge's position
    resolves to its sender, subs are window-pure, hub edges never
    divert."""
    from graphmat_tpu.ops.pallas_compact import divert_stragglers
    n, e = 3000, 8000
    s, r, v = _rand_graph(n, e, seed=47)
    h = 128                                  # rows for n=3000
    s_new, aux, h_ext = divert_stragglers(
        s.astype(np.int64), r.astype(np.int64), 4096, 256, h, 64,
        divert_min=800, bpsb=2, w_div=64, w_aux=16, rows=32)
    assert aux is not None and h_ext == h + aux.hc
    div = s_new != s
    assert (s[~div] < 64).sum() == (s < 64).sum() or True
    assert (s[div] >= 64).all()              # hub edges stay
    # resolve each virtual position through the aux pk map
    pk = np.asarray(aux.pk).reshape(-1)      # entry per position
    kb = np.asarray(aux.kb)
    base = (kb.astype(np.uint32) & ((1 << 22) - 1)).astype(np.int64) << 3
    pos = s_new[div] - h * 128
    sub = pos // (32 * 128)
    rel = (pk[pos] >> 7).astype(np.int64)
    lane = pk[pos] & 127
    src = (base[sub] + rel) * 128 + lane
    np.testing.assert_array_equal(src, s[div])


@pytest.mark.parametrize("kind", ["sum", "min"])
@pytest.mark.parametrize("compact", [False, True])
def test_spmv2u_window_pipeline_matches_sync(kind, compact):
    """Dense double-buffered window pipeline (x2_hbm + quad chunks):
    must be bit-identical to the synchronous chain path."""
    from graphmat_tpu.ops.pallas_spmv2u import (_identity_process,
                                                _spmv2u_call,
                                                plan_call_args)
    n, e = 2500, 30000
    s, r, v = _rand_graph(n, e, seed=31, skew=True)
    kw = dict(wr=512, windows=(16, 64), cell_min=64, rows=128, hub=128)
    if compact:
        kw.update(compact=True,
                  compact_kw=dict(divert_min=40, bpsb=2, w_div=64,
                                  w_aux=16))
    else:
        kw.update(compact=False)
    plan = build_spmv2u_plan(s, r, v, n, **kw)
    assert compact == (plan.aux is not None)
    arrays, static = plan_call_args(plan)
    x = np.arange(n, dtype=np.float32) * 0.125 + 1.0
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    y_sync = np.asarray(_spmv2u_call(
        arrays, static, jnp.asarray(xp), kind, _identity_process, True,
        x2_hbm=False))
    y_pipe = np.asarray(_spmv2u_call(
        arrays, static, jnp.asarray(xp), kind, _identity_process, True,
        x2_hbm=True))
    np.testing.assert_array_equal(y_sync, y_pipe)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_compaction_scattered_senders(kind):
    """Regression for the round-3 aux corruption: compact groups whose
    sender sets are NOT near-consecutive (lane map far from identity).
    The original routed aux gather silently read the row of whichever
    position owned a source's lane; the lane-pure layout makes the
    gather self-addressed."""
    rng = np.random.default_rng(77)
    n = 6000
    e = 9000
    # scattered senders: stride-multiplied ids so src & 127 is unrelated
    # to position order within a compact group
    s = (rng.integers(0, n // 13, e) * 13 +
         rng.integers(0, 13, e)) % n
    r = rng.integers(0, n, e)
    v = rng.normal(size=e).astype(np.float32)
    plan = build_spmv2u_plan(
        s.astype(np.int64), r.astype(np.int64), v, n, wr=256,
        windows=(16, 64), cell_min=64, rows=32, hub=64, compact=True,
        compact_kw=dict(divert_min=10_000, bpsb=2, w_div=64, w_aux=16))
    assert plan.aux is not None
    x = rng.random(n).astype(np.float32) + 0.5
    xp = np.zeros(plan.n_send_pad, np.float32)
    xp[:n] = x
    if kind == "min":
        xp[n:] = 1e30
    y = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                          process=lambda a, b: a, interpret=True))[:n]
    ref = _oracle(s, r, v, x, n, kind, lambda a, b: a)
    m = np.isfinite(ref)
    np.testing.assert_allclose(y[m], ref[m], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2u_banded_flat_cells(kind):
    """Banded-walk cells (round 5): a hub-free uniform graph with the
    flat acceptance forced low packs cells in per-tile granule bands;
    results must match the oracle through BOTH builders, and the plan
    must actually carry banded subs (kind > K)."""
    from graphmat_tpu.ops import pallas_spmv2u as U
    n, e = 4096, 40000
    s, r, v = _rand_graph(n, e, seed=77)
    x = np.random.default_rng(5).normal(size=n).astype(np.float32)

    def build(native):
        lib_orig = None
        import graphmat_tpu.native as nat
        if not native:
            lib_orig = nat.load_planner
            nat.load_planner = lambda: None
        try:
            # hub=0-ish: small hub so most edges classify into windows;
            # flat_min low so uniform cells land in the banded class
            return build_spmv2u_plan(
                s, r, v, n, wr=1024, hub=128, windows=(16, 64, 2048),
                cell_min=100000, flat_min=8, flat_w_min=16,
                flat_w_max=64, compact=False)
        finally:
            if lib_orig is not None:
                nat.load_planner = lib_orig

    want = _oracle(s, r, v, x, n, kind, lambda xs, vs: xs * vs)
    K = 3
    for native in (True, False):
        plan = build(native)
        kb = np.asarray(plan.kb).view(np.uint32)
        kd = (kb >> 24) & 15
        assert (kd > K).any(), "no banded subs formed"
        xp = np.zeros(plan.n_send_pad, np.float32)
        xp[:n] = x
        y = np.asarray(spmv2u(plan, jnp.asarray(xp), kind,
                              process=lambda xv, ev: xv * ev,
                              interpret=True))[:n]
        mask = want != (0.0 if kind == "sum"
                        else (np.inf if kind == "min" else -np.inf))
        np.testing.assert_allclose(y[mask], want[mask], rtol=2e-5,
                                   atol=2e-5)


def test_plan2u_native_gspan_matches_numpy():
    """The native per-row granule spans (gm_plan2u_gspan) must produce
    the SAME plan post-processing (row sort, activity ranges, tile
    bounds) as the numpy recompute they replaced."""
    import graphmat_tpu.native as nat
    if not nat.native_available() or \
            not hasattr(nat.load_planner(), "gm_plan2u_gspan"):
        pytest.skip("no native gspan")
    from graphmat_tpu.utils.generators import random_edgelist
    e = random_edgelist(3000, 8, seed=5)
    s = (e.src - 1).astype(np.int64)
    r = (e.dst - 1).astype(np.int64)
    v = e.val.astype(np.float32)
    n = max(e.m, e.n)
    p1 = build_spmv2u_plan(s, r, v, n, wr=1024, compact=False)
    lib = nat.load_planner()

    class NoGspan:
        def __getattr__(self, k):
            if k == "gm_plan2u_gspan":
                raise AttributeError(k)
            return getattr(lib, k)
    orig = nat.load_planner
    nat.load_planner = lambda: NoGspan()
    try:
        p2 = build_spmv2u_plan(s, r, v, n, wr=1024, compact=False)
    finally:
        nat.load_planner = orig
    np.testing.assert_array_equal(np.asarray(p1.act_lo),
                                  np.asarray(p2.act_lo))
    np.testing.assert_array_equal(np.asarray(p1.act_hi),
                                  np.asarray(p2.act_hi))
    np.testing.assert_array_equal(np.asarray(p1.pk), np.asarray(p2.pk))
    np.testing.assert_array_equal(np.asarray(p1.tb), np.asarray(p2.tb))
