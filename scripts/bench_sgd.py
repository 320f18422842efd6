"""SGD-CF (vec2 kernel) microbenchmark — the PERF.md protocol.

Synthetic MovieLens-ish bipartite ratings: 60K users x 20K items, 1M
ratings, K=20 latent factors.  Measures (a) the raw vec2 kernel (both
ALL_EDGES directions, chained in one jitted fori_loop dispatch) and (b)
the full engine per-iteration time.  Axon-tunnel protocol: warm the exact
executable, discard the first timed batch, fetch a scalar (not just
block_until_ready).

Usage: python scripts/bench_sgd.py [iters_per_dispatch]

Env: SGD_USERS / SGD_ITEMS / SGD_RATINGS override the workload shape
(e.g. 162541 / 59047 / 25000000 for the MovieLens-25M shape — measured
325 ms/iter = 154M edge-updates/s on one v5e chip, plan fill 0.83).
"""

import os
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.io.edgelist import EdgeList
    from graphmat_tpu.apps.sgd import SGDProgram, init_sgd_graph

    rng = np.random.default_rng(0)
    nu = int(os.environ.get("SGD_USERS", "60000"))
    ni = int(os.environ.get("SGD_ITEMS", "20000"))
    e = int(os.environ.get("SGD_RATINGS", "1000000"))
    K = 20
    n = nu + ni
    us = rng.integers(1, nu + 1, e).astype(np.int64)
    it = (nu + rng.integers(1, ni + 1, e)).astype(np.int64)
    val = rng.integers(1, 6, e).astype(np.float64)
    el = EdgeList(src=us, dst=it, val=val, m=n, n=n)

    t0 = time.time()
    g = Graph(el)
    print(f"graph build: {time.time() - t0:.2f}s", flush=True)

    prog = SGDProgram(k=K)
    init_sgd_graph(g, K)
    g.set_all_active()
    t0 = time.time()
    eng = Engine(prog, g)
    print(f"engine init (plans): {time.time() - t0:.2f}s", flush=True)
    for recv, plan in eng._plans.items():
        print(f"  plan[{recv}]: nc={plan.nc} fill={plan.fill:.3f} "
              f"segs={len(plan.segs)}", flush=True)

    # ---------------- raw kernel: both directions chained ----------------
    from graphmat_tpu.ops.pallas_spmv_vec2 import (KPAD, _spmv_vec2_call,
                                                   planv_call_args)

    plans = list(eng._plans.values())
    lv = jnp.asarray(np.asarray(g.vp["lv"], np.float32))
    statics = tuple(planv_call_args(p)[1] for p in plans)
    arrays0 = tuple(planv_call_args(p)[0] for p in plans)
    spads = tuple(p.n_send_pad for p in plans)
    npad0 = plans[0].n_pad
    proc = prog.pallas_vec2_semiring().process

    # plan arrays flow as jit ARGUMENTS — closure capture would inline
    # them as constants (hundreds of MB at MovieLens-25M scale)
    def make_chain(debug):
        @jax.jit
        def chain(arrays, lv):
            def pad32(a, target_rows):
                a = jnp.pad(a, ((0, target_rows - a.shape[0]),
                                (0, KPAD - K)))
                return a.reshape(-1)

            def one_iter(lv, _):
                total = jnp.zeros((npad0, KPAD), jnp.float32)
                for arr, static, spad in zip(arrays, statics, spads):
                    xw = pad32(lv, spad)
                    vw = pad32(lv, static[5])
                    y = _spmv_vec2_call(arr, static, xw, vw, None, proc,
                                        2, False, False, debug)
                    total = total + y[: npad0]
                new_lv = lv + 3.5e-7 * (-0.001 * lv
                                        + total[: lv.shape[0], :K])
                return new_lv, 0.0

            out, _ = jax.lax.scan(one_iter, lv, None, length=reps)
            return out
        return chain

    def timed_chain(debug):
        chain = make_chain(debug)
        r = chain(arrays0, lv)
        float(r[0, 0])  # compile + warm
        best = np.inf
        for trial in range(4):
            t0 = time.perf_counter()
            r = chain(arrays0, lv)
            float(r[0, 0])
            dt = (time.perf_counter() - t0) / reps
            if trial:
                best = min(best, dt)
            print(f"kernel chain [{debug or 'full'}] trial {trial}: "
                  f"{dt * 1e3:.2f} ms/iter", flush=True)
        return best

    best = timed_chain(None)
    print(f"KERNEL: {best * 1e3:.2f} ms/iter = "
          f"{2 * e / best / 1e6:.1f}M edge-updates/s", flush=True)
    if os.environ.get("SGD_DECOMPOSE"):
        for dbg in ("nogather", "novp", "noscatter"):
            b = timed_chain(dbg)
            print(f"  {dbg}: {b * 1e3:.2f} ms/iter "
                  f"-> phase ~{(best - b) * 1e3:.2f} ms", flush=True)

    # ---------------- engine end-to-end ----------------
    eng.run(iterations=2)   # compile + warm
    best_e = np.inf
    for trial in range(3):
        g2 = g
        t0 = time.perf_counter()
        eng.run(iterations=reps)
        dt = (time.perf_counter() - t0) / reps
        best_e = min(best_e, dt)
        print(f"engine trial {trial}: {dt * 1e3:.2f} ms/iter", flush=True)
    print(f"ENGINE: {best_e * 1e3:.2f} ms/iter = "
          f"{2 * e / best_e / 1e6:.1f}M edge-updates/s", flush=True)


if __name__ == "__main__":
    main()
