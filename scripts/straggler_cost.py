"""Quantify the straggler (last-window-class) chunks' share of v2u
kernel time: time the full plan vs a plan built WITHOUT the edges that
classify into the last (escalation) class.  Their chunks have fill ~0.2
AND walk the full 2048-row window, so they are the most expensive kind
per chunk; this measures whether a dedicated hypersparse path is worth
building (the reference's DCSC exists precisely for this corner,
DCSCTile.h).
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2 import _classify
    from graphmat_tpu.ops.pallas_spmv2u import (build_spmv2u_plan,
                                                _identity_process,
                                                _spmv2u_call)
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    reps = int(os.environ.get("SWEEP_REPS", "50"))
    wr, hub, cell_min = 4096, 2048, 4000
    windows = [160, 256, 1024, 2048]

    e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    s, r, v = g._host_edges["dst"]
    s = np.asarray(s, np.int64)
    r = np.asarray(r, np.int64)
    v = np.asarray(v, np.float32)
    n = g.n_pad
    LANE = 128
    h = max(((n + LANE - 1) // LANE + LANE - 1) // LANE * LANE, LANE)
    nb = (n + wr - 1) // wr
    kind, _, _, _ = _classify(s, r, r // wr, h, nb, wr, hub, windows,
                              cell_min)
    lastk = len(windows)
    keep = kind != lastk
    print(f"nnz={len(s)} stragglers={int((~keep).sum())} "
          f"({(~keep).mean()*100:.1f}%)")

    def timeit(ss, rr, vv, label):
        plan = build_spmv2u_plan(ss, rr, vv, n, n_recv=n,
                                 windows=tuple(windows),
                                 cell_min=cell_min, wr=wr)
        from graphmat_tpu.ops.pallas_spmv2u import plan_call_args
        arrays, static = plan_call_args(plan)

        @jax.jit
        def chain(arrays, x):
            def one(x, _):
                y = _spmv2u_call(arrays, static, x, "sum",
                                 _identity_process, False)
                return y[: plan.n_send_pad] * 0.99 + 0.01, 0.0
            out, _ = jax.lax.scan(one, x, None, length=reps)
            return out

        x0 = jnp.ones(plan.n_send_pad, jnp.float32)
        float(chain(arrays, x0)[0])
        best = np.inf
        for t in range(4):
            t0 = time.perf_counter()
            float(chain(arrays, x0)[0])
            if t:
                best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{label}: {best*1e3:6.2f} ms/iter nc={plan.nc} "
              f"fill={plan.fill:.3f}")
        return best

    t_full = timeit(s, r, v, "full      ")
    t_nostrag = timeit(s[keep], r[keep], v[keep], "no-straggl")
    print(f"straggler cost ~{(t_full-t_nostrag)*1e3:.2f} ms "
          f"({(t_full-t_nostrag)/t_full*100:.0f}% of kernel)")


if __name__ == "__main__":
    main()
