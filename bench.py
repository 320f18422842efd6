"""Headline benchmark: PageRank SpMV throughput (GTEPS) on one chip.

Runs the reference's headline workload — PageRank iterations over an RMAT
graph (BASELINE.json: RMAT + reference graphs, target >= 1.5 GTEPS/chip) —
through the real engine (degree pass + compiled PageRank iterations) and
prints ONE json line:

    {"metric": "pagerank_gteps_per_chip", "value": ..., "unit": "GTEPS",
     "vs_baseline": value / 1.5, ...}

Scale/iterations are adjustable via env: GRAPHMAT_BENCH_SCALE (default 20),
GRAPHMAT_BENCH_ITERS (default 10).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    scale = int(os.environ.get("GRAPHMAT_BENCH_SCALE", "20"))
    iters = int(os.environ.get("GRAPHMAT_BENCH_ITERS", "10"))
    edge_factor = int(os.environ.get("GRAPHMAT_BENCH_EDGEFACTOR", "16"))

    import jax

    from graphmat_tpu import Graph
    from graphmat_tpu.apps.pagerank import (DegreeProgram, PageRankProgram,
                                            init_pagerank_graph)
    from graphmat_tpu.core.runtime import Engine
    from graphmat_tpu.utils.generators import rmat_edgelist

    t0 = time.time()
    e = rmat_edgelist(scale, edge_factor, seed=1)
    gen_s = time.time() - t0

    t0 = time.time()
    g = Graph(e, build_in_edges=True, permute="degree")
    build_s = time.time() - t0

    init_pagerank_graph(g)
    g.set_all_active()
    t0 = time.time()
    Engine(DegreeProgram(), g).run(iterations=1)
    degree_s = time.time() - t0

    eng = Engine(PageRankProgram(), g)
    # warm-up with the SAME iteration count so the loop compiles once
    t0 = time.time()
    eng.run(iterations=iters)
    warm_s = time.time() - t0

    # measured run (re-init state, reuse compiled loop)
    init_pagerank_graph(g)
    g.set_all_active()
    Engine(DegreeProgram(), g).run(iterations=1)
    t0 = time.time()
    eng.run(iterations=iters)
    run_s = time.time() - t0

    pr = g.vp_numpy()["pagerank"]
    assert np.isfinite(pr).all(), "non-finite pagerank output"

    gteps = g.nnz * iters / run_s / 1e9
    print(json.dumps({
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
        },
        "timings_s": {
            "rmat_gen": round(gen_s, 2),
            "graph_build": round(build_s, 2),
            "degree_pass": round(degree_s, 2),
            "warmup_compile": round(warm_s, 2),
            "measured_run": round(run_s, 3),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
