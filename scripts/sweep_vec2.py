"""Quick vec2 plan-parameter sweep on the SGD bench workload."""

import sys
import time

import numpy as np


def main():
    import os
    import subprocess

    import jax
    import jax.numpy as jnp

    import graphmat_tpu.ops.pallas_spmv_vec2 as v2mod
    import graphmat_tpu.native as native
    from graphmat_tpu.ops.pallas_spmv_vec2 import (KPAD, _spmv_vec2_call,
                                                   build_spmv_vec2_plan)
    from graphmat_tpu.apps.sgd import _sgd_process_v2

    wyk = int(os.environ.get("SWEEP_WYK", "32"))
    if wyk != 32:
        here = os.path.dirname(os.path.abspath(native.__file__))
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
             "-fPIC", f"-DGM_WYK={wyk}",
             os.path.join(here, "planner.cpp"),
             "-o", os.path.join(here, "libgmplanner.so")], check=True)
        os.utime(os.path.join(here, "libgmplanner.so"))
        v2mod.WYK = wyk
    print(f"WYK={v2mod.WYK}", flush=True)

    rng = np.random.default_rng(0)
    nu, ni, e, K = 60000, 20000, 1_000_000, 20
    n = nu + ni
    us = rng.integers(0, nu, e).astype(np.int64)
    it = (nu + rng.integers(0, ni, e)).astype(np.int64)
    val = rng.integers(1, 6, e).astype(np.float32)
    lv0 = rng.standard_normal((n, K), np.float32) * 0.1

    reps = 20
    import itertools
    grid = os.environ.get(
        "SWEEP_GRID",
        "256:256,256:512,512:512,512:1024,512:2048,1024:1024,1024:2048")
    windows = tuple(int(w) for w in os.environ.get(
        "SWEEP_WINDOWS", "64,256,1024").split(","))
    print(f"windows={windows}", flush=True)
    for spec in grid.split(","):
        wy, cell_min = (int(x) for x in spec.split(":"))
        if True:
            t0 = time.time()
            plans = [build_spmv_vec2_plan(us, it, val, n, wy=wy,
                                          cell_min=cell_min,
                                          windows=windows),
                     build_spmv_vec2_plan(it, us, val, n, wy=wy,
                                          cell_min=cell_min,
                                          windows=windows)]
            tb = time.time() - t0
            lv = jnp.asarray(lv0)

            def pad32(a, rows_):
                a = jnp.pad(a, ((0, rows_ - a.shape[0]), (0, KPAD - K)))
                return a.reshape(-1)

            def one_iter(lv, _):
                total = jnp.zeros((plans[0].n_pad, KPAD), jnp.float32)
                for plan in plans:
                    xw = pad32(lv, plan.n_send_pad)
                    vw = pad32(lv, plan.n_pad)
                    arrays = (plan.kindid, plan.blkid, plan.sbase,
                              plan.rbase, plan.pk, plan.valp, plan.rcwt)
                    static = (plan.hs, plan.hr, plan.wr, plan.nb, plan.nc,
                              plan.n_pad, plan.rows, plan.wy, plan.classes,
                              plan.segs)
                    y = _spmv_vec2_call(arrays, static, xw, vw, None,
                                        _sgd_process_v2, 2, False, False)
                    total = total + y[: plans[0].n_pad]
                return lv + 3.5e-7 * (-0.001 * lv
                                      + total[: lv.shape[0], :K]), 0.0

            @jax.jit
            def chain(lv):
                out, _ = jax.lax.scan(one_iter, lv, None, length=reps)
                return out
            # (plan arrays ride as closure constants; small enough here)

            r = chain(lv)
            float(r[0, 0])
            best = np.inf
            for trial in range(3):
                t0 = time.perf_counter()
                float(chain(lv)[0, 0])
                dt = (time.perf_counter() - t0) / reps
                if trial:
                    best = min(best, dt)
            print(f"wy={wy:4d} cell_min={cell_min:5d}: "
                  f"{best * 1e3:6.2f} ms/iter  "
                  f"nc={plans[0].nc}+{plans[1].nc} "
                  f"fill={plans[0].fill:.3f}/{plans[1].fill:.3f} "
                  f"build={tb:.1f}s", flush=True)


if __name__ == "__main__":
    main()
