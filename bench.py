"""Headline benchmark: PageRank SpMV throughput (GTEPS) on one chip.

Runs the reference's headline workload — PageRank iterations over an RMAT
graph (BASELINE.json: RMAT + reference graphs, target >= 1.5 GTEPS/chip) —
through the real engine and prints ONE json line:

    {"metric": "pagerank_gteps_per_chip", "value": ..., "unit": "GTEPS",
     "vs_baseline": value / 1.5, ...}

The out-degree operand is precomputed on host (the benchmark measures the
PageRank SpMV iterations; running the Degree program first gives identical
values but doubles the cold-compile surface — the reference times its
degree pass separately too, src/PageRank.cpp:82-93).

Scale/iterations are adjustable via env: GRAPHMAT_BENCH_SCALE (default 20),
GRAPHMAT_BENCH_ITERS (default 50).  All iterations run inside ONE jitted
fori_loop dispatch; 50 iterations amortize the axon tunnel's ~130 ms
per-dispatch round-trip (host latency, not device time) below 3 ms/iter
while staying in the range a real until-convergence PageRank run uses.
"""

import json
import os
import sys
import time
import traceback

import numpy as np


def run_bench():
    scale = int(os.environ.get("GRAPHMAT_BENCH_SCALE", "20"))
    iters = int(os.environ.get("GRAPHMAT_BENCH_ITERS", "50"))
    edge_factor = int(os.environ.get("GRAPHMAT_BENCH_EDGEFACTOR", "16"))

    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.apps.pagerank import (PageRankProgram,
                                            init_pagerank_graph)
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.utils.generators import rmat_edgelist

    t0 = time.time()
    e = rmat_edgelist(scale, edge_factor, seed=1)
    gen_s = time.time() - t0

    t0 = time.time()
    g = Graph(e, build_in_edges=False, permute="degree")
    build_s = time.time() - t0

    # host degree operand (identical to the Degree program's output)
    n = max(e.m, e.n)
    deg = np.bincount(e.src - 1, minlength=n).astype(np.int32)

    def setup():
        init_pagerank_graph(g)
        gvp = dict(g.vp)
        full = np.zeros(g.n_pad, np.int32)
        if g.perm is None:
            full[:n] = deg
        else:
            full[g.perm] = deg
        gvp["degree"] = jnp.asarray(full)
        g.vp = gvp
        g.set_all_active()
        # complete the one-time state upload BEFORE the timed run: the
        # device_puts above are async, and through the axon tunnel their
        # ~65 ms of H2D otherwise lands inside the first timed dispatch
        jax.block_until_ready(list(g.vp.values()) + [g.active])
        float(jnp.sum(g.vp["pagerank"][:1]))

    setup()
    eng = Engine(PageRankProgram(), g)
    t0 = time.time()
    eng.run(iterations=iters)  # compile with the same static iter count
    warm_s = time.time() - t0

    # median of 5 measured runs, per-rep list recorded — the axon tunnel
    # swings ±15-20% per run and up to ±20% session-to-session, so the
    # BENCH_r* record needs the spread, not just one point
    reps = int(os.environ.get("GRAPHMAT_BENCH_REPS", "5"))
    rep_s = []
    for _ in range(reps):
        setup()
        t0 = time.time()
        eng.run(iterations=iters)
        rep_s.append(time.time() - t0)
    run_s = float(np.median(rep_s))

    pr = g.vp_numpy()["pagerank"]
    assert np.isfinite(pr).all(), "non-finite pagerank output"

    gteps = g.nnz * iters / run_s / 1e9
    return {
        "metric": "pagerank_gteps_per_chip",
        "value": round(gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / 1.5, 4),
        "config": {
            "graph": f"rmat{scale}x{edge_factor}",
            "nnz": int(g.nnz),
            "iters": iters,
            "backend": jax.default_backend(),
            "pallas": bool(eng.use_pallas),
            "kernel": os.environ.get("GRAPHMAT_KERNEL", "v2u"),
        },
        "timings_s": {
            "rmat_gen": round(gen_s, 2),
            "graph_build": round(build_s, 2),
            "warmup_compile": round(warm_s, 2),
            "measured_run_median": round(run_s, 3),
            "measured_runs": [round(t, 3) for t in rep_s],
            "best_gteps": round(g.nnz * iters / min(rep_s) / 1e9, 3),
        },
    }


def main() -> int:
    try:
        result = run_bench()
    except Exception as exc:  # always emit a line for the driver
        result = {
            "metric": "pagerank_gteps_per_chip",
            "value": 0.0,
            "unit": "GTEPS",
            "vs_baseline": 0.0,
            "error": f"{type(exc).__name__}: {exc}",
        }
        traceback.print_exc(file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
