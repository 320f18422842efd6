"""Same-session BFS per-level cost decomposition on the real chip.

BENCH_r03 has BFS at 0.43 GTEPS vs the 1.5 target: ~5.5 ms/level where
the dense min kernel costs ~2.5 ms.  This harness splits a level into

  level = engine_xla + act/eff prefix + aux-sent pass + kernel(frontier)

by timing, in ONE session:
  1. dense_min        — chained min kernel, no sent (the kernel floor)
  2. sparse_full      — chained min kernel, sent = all-true
  3. sparse_tiny      — chained min kernel, sent = one vertex
  4. acteff           — chained _chunk_activity_u (+ aux sent pass)
  5. engine_stub      — 7-level fixed BFS run with the kernel stubbed
                        (isolates the engine's XLA ops per level)
  6. engine_full      — 7-level fixed BFS run, real kernel
  7. bfs_bench        — the bench.py 16-source until-convergence scan

Env: SWEEP_SCALE (20), SWEEP_REPS (50).
"""

import os
import time

import numpy as np


def timed_scalar(fn, reps, trials=4):
    """Best-of-trials wall time of fn() (which must block on a scalar)."""
    fn()
    best = np.inf
    for t in range(trials):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / reps
        if t:
            best = min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.apps.bfs import BFSProgram, INF_DEPTH, init_bfs_graph
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.ops import pallas_spmv2u as u
    from graphmat_tpu.ops.pallas_spmv2u import (_identity_process,
                                                _spmv2u_call,
                                                plan_call_args)
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    reps = int(os.environ.get("SWEEP_REPS", "50"))

    e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    nnz = g.nnz
    t0 = time.time()
    plan = g.pallas_plan2u("dst")
    print(f"plan build {time.time() - t0:.1f}s nc={plan.nc} "
          f"fill={plan.fill:.3f} wr={plan.wr} h={plan.h} "
          f"h_src={plan.h_src} aux={plan.aux is not None}", flush=True)
    arrays, static = plan_call_args(plan, use_val=False)
    nsp = plan.n_send_pad

    ids = jnp.arange(1, nsp + 1, dtype=jnp.float32)
    BIG = 1e30

    # ---- 1-3: kernel-only chains --------------------------------------
    def kernel_chain(sent_mode):
        sent0 = None
        if sent_mode == "full":
            sent0 = jnp.ones(nsp, bool)
        elif sent_mode == "tiny":
            sent0 = (jnp.arange(nsp) == 17)       # a HUB row: worst case
        elif sent_mode == "tiny_mid":
            sent0 = (jnp.arange(nsp) == nsp // 2 + 17)   # non-hub row

        @jax.jit
        def chain(arrays, x0):
            def one(x, _):
                y = _spmv2u_call(arrays, static, x, "min",
                                 _identity_process, False, sent=sent0)
                ypad = jnp.pad(y, (0, nsp - y.shape[0])) \
                    if y.shape[0] < nsp else y[:nsp]
                return jnp.minimum(ypad, BIG) * 1.0000001, 0.0
            out, _ = jax.lax.scan(one, x0, None, length=reps)
            return out

        x0 = jnp.where(sent0, ids, BIG) if sent0 is not None else ids
        return timed_scalar(lambda: float(chain(arrays, x0)[0]), reps)

    dense = kernel_chain(None)
    print(f"dense_min    {dense*1e3:6.2f} ms/iter "
          f"({nnz/dense/1e9:.2f} GTEPS)", flush=True)
    sfull = kernel_chain("full")
    print(f"sparse_full  {sfull*1e3:6.2f} ms/iter "
          f"(skip-test overhead {(sfull-dense)*1e3:+.2f})", flush=True)
    stiny = kernel_chain("tiny")
    print(f"sparse_tiny  {stiny*1e3:6.2f} ms/iter  <- skip floor, "
          f"hub-row frontier", flush=True)
    stiny2 = kernel_chain("tiny_mid")
    print(f"sparse_tiny2 {stiny2*1e3:6.2f} ms/iter  <- skip floor, "
          f"non-hub frontier", flush=True)

    # ---- 4: act/eff prefix (+ aux sent pass) alone --------------------
    h, wr, nb, nc, n_pad, classes, rows = static[:7]
    h_src = static[8] if len(static) > 8 else h
    aux_static = static[9] if len(static) > 9 else None
    S = max(rows // u.SUBR, 1)
    kb = arrays[0]

    use_gm = (len(arrays) > 11 and arrays[11] is not None
              and (h == h_src or arrays[12] is not None))
    print(f"activity path: {'matmul (act_gm)' if use_gm else 'takes'}",
          flush=True)

    @jax.jit
    def acteff_chain(arrays, sent0):
        def one(sent, _):
            sentm = sent[: h_src * u.LANE].reshape(h_src, u.LANE)
            if use_gm:
                ngran_src = h_src // u.ACT_GRAN
                gact = jnp.any(sentm.reshape(
                    ngran_src, u.ACT_GRAN * u.LANE), axis=1)
                if h > h_src:
                    vact = jnp.matmul(
                        arrays[12], gact.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) > 0
                    hcg = (h - h_src) // u.ACT_GRAN
                    gact = jnp.concatenate(
                        [gact, jnp.any(vact.reshape(hcg, u.ACT_GRAN),
                                       axis=1)])
                sub_act = jnp.matmul(
                    arrays[11], gact.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) > 0
                cact = jnp.any(sub_act.reshape(nc, S), axis=1)
                idxs = jnp.arange(nc, dtype=jnp.int32)
                act = jnp.maximum(
                    jax.lax.cummax(jnp.where(cact, idxs, -1)), 0)
            else:
                rowact = jnp.any(sentm, axis=1).astype(jnp.int32)
                pref = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                        jnp.cumsum(rowact)])
                if h > h_src and aux_static is not None:
                    vlo, vhi = arrays[7], arrays[8]
                    vact = (jnp.take(pref, vhi)
                            - jnp.take(pref, vlo)) > 0
                    pref = jnp.concatenate(
                        [pref,
                         pref[-1] + jnp.cumsum(vact.astype(jnp.int32))])
                act, eff = u._chunk_activity_u(pref, arrays[9],
                                               arrays[10], nc, S)
            # chain dependence through act
            return sent ^ (act.sum() < -1), 0.0
        out, _ = jax.lax.scan(one, sent0, None, length=reps)
        return out

    sent0 = jnp.ones(h * u.LANE, bool)
    acteff = timed_scalar(
        lambda: bool(acteff_chain(arrays, sent0)[0]), reps)
    print(f"acteff+aux   {acteff*1e3:6.2f} ms/iter", flush=True)

    # ---- 5-6: engine fixed-7-level runs -------------------------------
    init_bfs_graph(g, 1)
    iota = jnp.arange(g.n_pad, dtype=jnp.int32)
    parent0 = jnp.full(g.n_pad, -1, jnp.int32)
    id_plane = g.vp["id"]

    def engine_run(stub):
        orig = u._spmv2u_call
        if stub:
            def stub_call(plan_arrays, plan_static, x, reduce_kind,
                          process, interpret, debug=None, x2_hbm=None,
                          sent=None, want_got=False):
                npad = plan_static[4]
                y = x[:npad] * 0.5 + 1.0
                if y.shape[0] < npad:
                    y = jnp.pad(y, (0, npad - y.shape[0]))
                return y
            u._spmv2u_call = stub_call
        try:
            eng = Engine(BFSProgram(), g)
            structure = eng._structure()

            @jax.jit
            def run7(structure, src0):
                def one(carry, k):
                    vp = {"depth": jnp.where(iota == src0 + k * 0, 0,
                                             jnp.int32(INF_DEPTH)),
                          "parent": parent0, "id": id_plane}
                    active = iota == src0
                    it, _st, vpo, _a, _c = eng._run_fixed(
                        structure, jnp.int32(1), vp, active, 7)
                    return carry + it, 0.0
                tot, _ = jax.lax.scan(one, jnp.int32(0),
                                      jnp.arange(max(reps // 7, 1)))
                return tot
            src0 = jnp.int32(17)
            nrun = max(reps // 7, 1) * 7
            return timed_scalar(
                lambda: int(run7(structure, src0)), nrun)
        finally:
            u._spmv2u_call = orig

    stub_t = engine_run(stub=True)
    print(f"engine_stub  {stub_t*1e3:6.2f} ms/level "
          f"(engine XLA ops, kernel stubbed)", flush=True)
    full_t = engine_run(stub=False)
    print(f"engine_full  {full_t*1e3:6.2f} ms/level (7-level fixed, "
          f"tiny frontier)", flush=True)

    # ---- 7: the bench.py protocol -------------------------------------
    eng = Engine(BFSProgram(), g)
    structure = eng._structure()
    R = 16

    @jax.jit
    def bfs_many(structure, sources0):
        def one(carry, src0):
            vp = {"depth": jnp.where(iota == src0, 0,
                                     jnp.int32(INF_DEPTH)),
                  "parent": parent0, "id": id_plane}
            active = iota == src0
            it, _st, vpo, _a, _c = eng._run_conv(
                structure, jnp.int32(1), vp, active, jnp.int32(128))
            reached = jnp.sum((vpo["depth"] != INF_DEPTH).astype(jnp.int32))
            return carry + it, (it, reached)
        tot, (its, reached) = jax.lax.scan(one, jnp.int32(0), sources0)
        return tot, its, reached

    rng = np.random.default_rng(7)
    odeg = np.bincount(e.src - 1, minlength=g.n)
    deg_int = np.zeros(g.n_pad, np.int64)
    if g.perm is None:
        deg_int[: g.n] = odeg
    else:
        deg_int[g.perm] = odeg
    cand = np.flatnonzero(deg_int > 0)
    sources = jnp.asarray(rng.choice(cand, size=R).astype(np.int32))
    tot, its, reached = jax.block_until_ready(bfs_many(structure, sources))
    tot_l = int(tot)

    def once():
        jax.block_until_ready(bfs_many(structure, sources))
    bench = timed_scalar(lambda: once(), 1)
    print(f"bfs_bench    {bench*1e3:6.1f} ms / {R} BFS "
          f"({R*nnz/bench/1e9:.2f} GTEPS, {tot_l} levels total, "
          f"{bench/tot_l*1e3:.2f} ms/level avg)", flush=True)
    print(f"levels per source: {list(np.asarray(its))}")


if __name__ == "__main__":
    main()
