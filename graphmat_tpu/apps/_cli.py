"""Shared CLI helpers for the app entry points.

Each app module is runnable as ``python -m graphmat_tpu.apps.<name>`` with
argument conventions mirroring the reference binaries (``src/*.cpp`` usage
strings), e.g.::

    python -m graphmat_tpu.apps.pagerank A.mtx
    python -m graphmat_tpu.apps.bfs A.mtx 5
    python -m graphmat_tpu.apps.sssp A.mtx 1
    python -m graphmat_tpu.apps.delta_stepping A.mtx 3 1
    python -m graphmat_tpu.apps.sgd ratings.mtx
    python -m graphmat_tpu.apps.lda A.mtx NDOC NTERMS [ITERS]
"""

from __future__ import annotations

import time

from ..io.edgelist import load_edgelist


def load_graph_file(path, **kw):
    t0 = time.time()
    e = load_edgelist(path, **kw)
    print(f"Read {e.nnz} edges, {max(e.m, e.n)} vertices "
          f"({time.time() - t0:.2f}s)")
    return e


def print_first(vals, k: int = 10, label: str = ""):
    for i, v in enumerate(vals[:k], start=1):
        print(f"{label}{i} : {v}")
