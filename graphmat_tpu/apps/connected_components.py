"""Connected components by min-label propagation.

Not in the reference's app set — included as the canonical "write your own
GraphProgram" example (the HCC algorithm from the GraphMat paper's
evaluation): every vertex repeatedly adopts the smallest component label
among itself and its neighbors until no label changes.  Runs over
ALL_EDGES so undirected components emerge from a directed edge list.

Eligible for the min-semiring Pallas fast path (labels are vertex ids,
exact in f32 below 2^24).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph
from ..core.program import GraphProgram, PallasSemiring
from ..core.runtime import engine_for
from ..core.types import Activity, Direction, MIN, UNTIL_CONVERGENCE

__all__ = ["ConnectedComponentsProgram", "run_connected_components"]


class ConnectedComponentsProgram(GraphProgram):
    order = Direction.ALL_EDGES
    activity = Activity.ACTIVE_ONLY
    reduce = MIN
    process_requires_vertexprop = False

    def send_message(self, state, vp):
        return vp["label"], None

    def process_message(self, state, msg, edge_vals, vp_r):
        return msg

    def apply(self, state, reduced, vp):
        out = dict(vp)
        out["label"] = jnp.minimum(vp["label"], reduced)
        return out

    def changed(self, old_vp, new_vp):
        return old_vp["label"] != new_vp["label"]

    def pallas_semiring(self):
        return PallasSemiring(
            "min",
            encode=lambda msg: msg.astype(jnp.float32),
            decode=lambda y: jnp.where(jnp.isfinite(y), y,
                                       0.0).astype(jnp.int32),
            uses_edge_value=False)


def run_connected_components(graph: Graph,
                             iterations: int = UNTIL_CONVERGENCE):
    """Returns ``(labels[n], ncomponents, niter)``; labels are the smallest
    1-based vertex id in each component."""
    ids = np.arange(1, graph.n + 1, dtype=np.int32)
    graph.init_vertexproperty(label=ids)
    graph.set_all_active()
    niter = engine_for(ConnectedComponentsProgram(), graph).run(
        iterations=iterations)
    labels = graph.vp_numpy()["label"]
    return labels, int(np.unique(labels).size), niter


def _main(argv=None):
    import sys
    import time
    from ._cli import build_graph, load_graph_file
    args = (argv if argv is not None else sys.argv[1:])
    if not args:
        print("Correct format: connected_components A.mtx")
        return 0
    g = build_graph(load_graph_file(args[0]))
    t0 = time.time()
    labels, ncomp, niter = run_connected_components(g)
    print(f"Completed {niter} iterations")
    print(f"Time = {(time.time() - t0) * 1e3:.3f} ms")
    print(f"Connected components = {ncomp}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(_main())
