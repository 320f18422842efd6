"""Breadth-first search with parent tracking (reference: ``src/BFS.cpp``).

Level-synchronous BFS: active frontier vertices whose depth equals
``current_depth - 1`` send their own id (``src/BFS.cpp:83-88``); an
unvisited receiver takes depth = current_depth and records the sender as
parent (``src/BFS.cpp:89-93``).  The reference's overwrite-reduce
(``reduce_function: a=b``) picks an arbitrary parent; we reduce with MIN so
the smallest sender id wins — depths are identical, parents deterministic.

Vertex property: ``depth`` (int32, INF sentinel), ``parent`` (int32, -1),
``id`` (int32, 1-based, set at init like ``src/BFS.cpp:113-118``).
Program state: ``current_depth`` starting at 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph
from ..core.program import GraphProgram, PallasSemiring
from ..core.runtime import engine_for
from ..core.types import Activity, Direction, ANY, UNTIL_CONVERGENCE

__all__ = ["BFSProgram", "run_bfs", "INF_DEPTH"]

INF_DEPTH = np.iinfo(np.int32).max  # MAX_DIST analog (src/BFS.cpp:38)


class BFSProgram(GraphProgram):
    order = Direction.OUT_EDGES
    activity = Activity.ACTIVE_ONLY
    reduce = ANY  # overwrite-reduce; deterministic min-id winner
    process_requires_vertexprop = False

    def init_state(self, graph):
        return jnp.int32(1)  # current_depth (src/BFS.cpp:70)

    def send_message(self, state, vp):
        current_depth = state
        return vp["id"], vp["depth"] == current_depth - 1

    def process_message(self, state, msg, edge_vals, vp_r):
        return msg

    def apply(self, state, reduced, vp):
        current_depth = state
        unvisited = vp["depth"] == INF_DEPTH
        out = dict(vp)
        out["depth"] = jnp.where(unvisited, current_depth, vp["depth"])
        out["parent"] = jnp.where(unvisited, reduced, vp["parent"])
        return out

    def changed(self, old_vp, new_vp):
        return old_vp["depth"] != new_vp["depth"]  # operator!= (src/BFS.cpp:52)

    def do_every_iteration(self, state, vp, it, ctx):
        return state + 1

    def pallas_semiring(self):
        # overwrite-reduce realized as min over sender ids (ids < 2**24)
        return PallasSemiring(
            "min",
            encode=lambda msg: msg.astype(jnp.float32),
            decode=lambda y: jnp.where(jnp.isfinite(y), y,
                                       0.0).astype(jnp.int32),
            uses_edge_value=False)


def init_bfs_graph(graph: Graph, source1: int) -> None:
    """Set ids, inf depths, then seed the 1-based source at depth 0."""
    ids = np.arange(1, graph.n + 1, dtype=np.int32)
    graph.init_vertexproperty(
        depth=np.int32(INF_DEPTH),
        parent=np.int32(-1),
        id=ids,
    )
    graph.set_all_inactive()
    graph.set_vertexproperty(source1, depth=0)
    graph.set_active(source1)


def run_bfs(graph: Graph, source1: int,
            iterations: int = UNTIL_CONVERGENCE):
    """Returns ``(depth[n], parent[n], niter)``; unreached depth = INF_DEPTH."""
    init_bfs_graph(graph, source1)
    eng = engine_for(BFSProgram(), graph)
    niter = eng.run(iterations=iterations)
    vp = graph.vp_numpy()
    return vp["depth"], vp["parent"], niter


def reachable_count(graph: Graph) -> int:
    """``applyReduceAllVertices(reachable_or_not)`` analog (src/BFS.cpp:100-106)."""
    return int((graph.vp_numpy()["depth"] < INF_DEPTH).sum())


def _main(argv=None):
    """CLI parity with ``src/BFS.cpp``: <A.mtx> <source 1-based>."""
    import sys
    import time
    from ._cli import build_graph, load_graph_file
    args = (argv if argv is not None else sys.argv[1:])
    if len(args) < 2:
        print("Correct format: bfs A.mtx source_vertex (1-based index)")
        return 0
    from ..core.graph import Graph
    g = build_graph(load_graph_file(args[0]), build_in_edges=False)
    t0 = time.time()
    depth, parent, niter = run_bfs(g, int(args[1]))
    print(f"Completed {niter} iterations")
    print(f"Time = {(time.time() - t0) * 1e3:.3f} ms")
    print(f"Reachable vertices = {int((depth < INF_DEPTH).sum())}")
    for i in range(min(10, g.n)):
        if depth[i] < INF_DEPTH:
            print(f"Depth {i + 1} : {depth[i]} parent: {parent[i]}")
        else:
            print(f"Depth {i + 1} : INF")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(_main())
