"""Graph-family perf matrix (VERDICT r2 #7): the v2u plan parameters
were tuned on RMAT — validate the kernel across the reference's own
fixture diversity (``test/generator.h:43-220``) at production scale.

Families, all ~16M edges on one chip:

* ``rmat``     — RMAT-20 x16 (the tuning family, the yardstick)
* ``uniform``  — uniform-random senders/receivers, 1M vertices
* ``layered``  — 512-layer DAG (road/mesh class: high diameter,
  id-local frontiers), 1M vertices
* ``bipartite``— ratings graph 600K users x 200K items

Per family: dense sum-SpMV (PageRank class) and dense min-SpMV
(SSSP class) through the v2u kernel, chained 50 iters/dispatch,
best-of-3 trials (axon-tunnel protocol).  Prints one JSON line per
(family, kind) plus a summary ratio vs the RMAT number.

Usage: python scripts/bench_families.py [families...]
Env: FAM_EDGES (default 16_000_000), FAM_REPS (50).
"""

import json
import os
import sys
import time

import numpy as np


def gen_family(name, target_e):
    from graphmat_tpu.io.edgelist import EdgeList
    from graphmat_tpu.utils.generators import rmat_edgelist
    rng = np.random.default_rng(11)
    if name == "rmat":
        return rmat_edgelist(20, 16, seed=1)
    if name == "uniform":
        n = 1 << 20
        s = rng.integers(1, n + 1, target_e)
        d = rng.integers(1, n + 1, target_e)
        v = rng.integers(1, 256, target_e).astype(np.float64)
        return EdgeList(src=s, dst=d, val=v, m=n, n=n)
    if name == "layered":
        layers, width = 512, (1 << 20) // 512
        n = layers * width
        deg = max(target_e // n, 1)
        src_l = rng.integers(0, layers - 1, n * deg)
        s = src_l * width + rng.integers(0, width, n * deg) + 1
        d = (src_l + 1) * width + rng.integers(0, width, n * deg) + 1
        v = rng.integers(1, 256, n * deg).astype(np.float64)
        return EdgeList(src=s, dst=d, val=v, m=n, n=n)
    if name == "bipartite":
        nu, ni = 600_000, 200_000
        n = nu + ni
        # zipf-ish item popularity (the MovieLens shape)
        items = np.minimum((rng.pareto(1.1, target_e) * 50).astype(
            np.int64), ni - 1)
        s = rng.integers(1, nu + 1, target_e)
        d = nu + items + 1
        v = rng.integers(1, 6, target_e).astype(np.float64)
        return EdgeList(src=s, dst=d, val=v, m=n, n=n)
    raise ValueError(name)


def main():
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2u import (_identity_process,
                                                _spmv2u_call,
                                                plan_call_args)

    target_e = int(os.environ.get("FAM_EDGES", "16000000"))
    reps = int(os.environ.get("FAM_REPS", "50"))
    fams = sys.argv[1:] or ["rmat", "uniform", "layered", "bipartite"]
    interp = jax.default_backend() != "tpu"
    results = {}
    for fam in fams:
        t0 = time.time()
        e = gen_family(fam, target_e)
        g = Graph(e, build_in_edges=False, permute="degree")
        t_build = time.time() - t0
        t0 = time.time()
        plan = g.pallas_plan2u("dst")
        t_plan = time.time() - t0
        arrays, static = plan_call_args(plan)
        print(f"[{fam}] nnz={g.nnz} nc={plan.nc} fill={plan.fill:.3f} "
              f"wr={plan.wr} aux={plan.aux is not None} "
              f"build={t_build:.1f}s plan={t_plan:.1f}s", flush=True)

        for kind in ("sum", "min"):
            def make_chain(nreps):
                @jax.jit
                def chain(arrays, x):
                    def one(x, _):
                        y = _spmv2u_call(arrays, static, x, kind,
                                         _identity_process, interp)
                        ypad = jnp.pad(y, (0, plan.n_send_pad - y.shape[0])) \
                            if y.shape[0] < plan.n_send_pad \
                            else y[: plan.n_send_pad]
                        return ypad * 0.99 + 0.01, 0.0
                    out, _ = jax.lax.scan(one, x, None, length=nreps)
                    return out
                return chain

            # slope method (PERF round 4a): the tunnel costs ~25 ms per
            # dispatch+fetch — per-iter = (t(4R) - t(R)) / 3R
            x0 = jnp.ones(plan.n_send_pad, jnp.float32)
            ts = {}
            for nreps in (reps, 4 * reps):
                ch = make_chain(nreps)
                float(ch(arrays, x0)[0])      # compile + warm
                best_t = np.inf
                for trial in range(3):
                    t0 = time.perf_counter()
                    float(ch(arrays, x0)[0])
                    dt = time.perf_counter() - t0
                    if trial:
                        best_t = min(best_t, dt)
                ts[nreps] = best_t
            best = (ts[4 * reps] - ts[reps]) / (3 * reps)
            gteps = g.nnz / best / 1e9
            results[(fam, kind)] = gteps
            print(json.dumps({"family": fam, "kind": kind,
                              "ms_per_iter": round(best * 1e3, 3),
                              "gteps": round(gteps, 3),
                              "nnz": int(g.nnz),
                              "fill": round(plan.fill, 3)}), flush=True)
        del g, plan, arrays

    for kind in ("sum", "min"):
        base = results.get(("rmat", kind))
        if not base:
            continue
        for fam in fams:
            if fam == "rmat" or (fam, kind) not in results:
                continue
            r = results[(fam, kind)] / base
            flag = "" if r >= 2 / 3 else "  <-- BELOW 2/3 of RMAT"
            print(f"ratio {fam}/{kind} vs rmat: {r:.2f}{flag}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
