"""Weak-scaling harness: PageRank over growing meshes.

Usage (virtual CPU devices, the mpirun analog)::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/weak_scaling.py --platform cpu --scale 14

On real multi-chip hardware drop ``--platform cpu``.  Keeps the per-device
edge count constant (RMAT scale grows with the mesh) and reports iterations
per second and weak-scaling efficiency vs the 1-device run — the
reference-equivalent metric is BASELINE.md's >=80% at 1->4 hosts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=14,
                    help="RMAT scale per device (vertices = 2^scale * ndev)")
    ap.add_argument("--edgefactor", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--max-devices", type=int, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from graphmat_tpu.apps.pagerank import DegreeProgram, PageRankProgram
    from graphmat_tpu.parallel.dist_graph import DistGraph
    from graphmat_tpu.parallel.dist_runtime import DistEngine
    from graphmat_tpu.parallel.mesh import factor2d, make_mesh
    from graphmat_tpu.utils.generators import rmat_edgelist

    devices = jax.devices()
    counts = []
    d = 1
    while d <= len(devices) and (args.max_devices is None
                                 or d <= args.max_devices):
        counts.append(d)
        d *= 2

    results = []
    base_rate = None
    for nd in counts:
        import math
        extra = int(math.log2(nd))
        e = rmat_edgelist(args.scale + extra, args.edgefactor, seed=7)
        mesh = make_mesh(devices[:nd], factor2d(nd))
        g = DistGraph(e, mesh, permute="degree")
        g.init_vertexproperty(pagerank=np.float32(0.3), degree=np.int32(0))
        g.set_all_active()
        # use_pallas=True: force the shipping Pallas tile kernels even on
        # CPU (interpret mode) so the measured dataflow is the production
        # one — the default would drop to the XLA segment path off-TPU
        DistEngine(DegreeProgram(), g, use_pallas=True).run(iterations=1)
        eng = DistEngine(PageRankProgram(), g, use_pallas=True)
        eng.run(iterations=args.iters)  # warm-up/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            eng.run(iterations=args.iters)
            best = min(best, time.time() - t0)
        dt = best
        rate = e.nnz * args.iters / dt / 1e9
        if base_rate is None:
            base_rate = rate / nd if nd == 1 else rate
        eff = rate / (base_rate * nd)
        # analytic per-device per-iteration collective bytes (PageRank:
        # f32 msg all_gather along 'r', f32 partial psum_scatter along
        # 'c', 4-byte convergence psum) — the wire cost the reference
        # pays via compressed Isend/Irecv (multinode/spmspv.h:62-116)
        R, C = mesh.devices.shape
        S = g.S
        coll = {
            "all_gather_r_bytes": int((R - 1) * S * 4),
            "psum_scatter_c_bytes": int((C - 1) * S * 4),
            "convergence_psum_bytes": 4,
        }
        results.append({"devices": nd, "mesh": list(mesh.devices.shape),
                        "nnz": int(e.nnz), "gteps": round(rate, 4),
                        "efficiency": round(eff, 3),
                        "pallas": bool(eng.use_pallas),
                        "collectives_per_iter_per_device": coll})
        print(json.dumps(results[-1]))
    print(json.dumps({"weak_scaling": results,
                      "backend": jax.default_backend(),
                      "note": ("virtual CPU devices validate the sharded "
                               "dataflow; ICI efficiency needs real "
                               "multi-chip hardware")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
