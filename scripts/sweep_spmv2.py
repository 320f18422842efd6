"""Scalar v2 plan-parameter sweep on the bench.py RMAT workload.

MODE=sum (default) sweeps the sum layout (PageRank class); MODE=mm
sweeps the min/max colored layout (BFS/SSSP class).
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2 import (build_spmv2_plan,
                                               build_spmv2m_plan,
                                               _identity_process,
                                               _spmv2_call,
                                               _spmv2m_call)

    mode = os.environ.get("SWEEP_MODE", "sum")  # sum | mm | usum | umin
    from graphmat_tpu.ops.pallas_spmv2u import (build_spmv2u_plan,
                                                _spmv2u_call)
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    reps = int(os.environ.get("SWEEP_REPS", "50"))

    t0 = time.time()
    e = rmat_edgelist(scale, 16, seed=1)
    print(f"rmat gen: {time.time() - t0:.1f}s nnz={e.nnz}", flush=True)
    g = Graph(e, build_in_edges=False, permute="degree")
    senders0, receivers0, vals = g._host_edges["dst"]
    nnz = len(senders0)

    grid = os.environ.get("SWEEP_GRID", "64,256,1024,2048:4000:4096")
    for spec in grid.split(";"):
        parts = spec.split(":")
        wins, cm = parts[0], parts[1]
        wr = int(parts[2]) if len(parts) > 2 else 4096
        windows = tuple(int(w) for w in wins.split(","))
        cell_min = int(cm)
        t0 = time.time()
        if mode in ("usum", "umin", "umax"):
            rows_u = int(os.environ.get("SWEEP_ROWS", "128"))
            rm_min = int(os.environ.get("SWEEP_RM", "129"))
            plan = build_spmv2u_plan(senders0, receivers0, vals, g.n_pad,
                                     n_recv=g.n_pad, windows=windows,
                                     cell_min=cell_min, wr=wr,
                                     rows=rows_u, rowmode_min=rm_min)
            from graphmat_tpu.ops.pallas_spmv2u import plan_call_args
            arrays, static = plan_call_args(plan)
        elif mode == "mm":
            plan = build_spmv2m_plan(senders0, receivers0, vals, g.n_pad,
                                     n_recv=g.n_pad, windows=windows,
                                     cell_min=cell_min, wr=wr)
            arrays = (plan.kindid, plan.blkid, plan.base, plan.ngran,
                      plan.rowmask, plan.pk, plan.val)
        else:
            plan = build_spmv2_plan(senders0, receivers0, vals, g.n_pad,
                                    n_recv=g.n_pad, windows=windows,
                                    cell_min=cell_min, wr=wr)
            arrays = (plan.kindid, plan.blkid, plan.base, plan.kind2,
                      plan.base2, plan.pk, plan.val)
        tb = time.time() - t0
        if mode not in ("usum", "umin"):   # v2u static comes from plan_call_args
            static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
                      plan.classes, plan.rows) + (
                          (plan.splits,) if hasattr(plan, "splits") else ())

        @jax.jit
        def chain(arrays, x):
            def one(x, _):
                if mode in ("usum", "umin", "umax"):
                    y = _spmv2u_call(arrays, static, x, mode[1:],
                                     _identity_process, False)
                elif mode == "mm":
                    y = _spmv2m_call(arrays, static, x, "min",
                                     _identity_process, False)
                else:
                    y = _spmv2_call(arrays, static, x, _identity_process,
                                    2, False)
                return y[: plan.n_send_pad] * 0.99 + 0.01, 0.0
            out, _ = jax.lax.scan(one, x, None, length=reps)
            return out

        x0 = jnp.ones(plan.n_send_pad, jnp.float32)
        float(chain(arrays, x0)[0])
        best = np.inf
        for trial in range(3):
            t0 = time.perf_counter()
            float(chain(arrays, x0)[0])
            dt = (time.perf_counter() - t0) / reps
            if trial:
                best = min(best, dt)
        print(f"W={windows} cm={cell_min} wr={wr}: "
              f"{best * 1e3:6.2f} ms/iter "
              f"({nnz / best / 1e9:.2f} GTEPS) nc={plan.nc} "
              f"fill={plan.fill:.3f} build={tb:.1f}s", flush=True)


if __name__ == "__main__":
    main()
