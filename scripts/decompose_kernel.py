"""Same-session kernel phase decomposition on the real chip.

Times full / nogather / noscatter variants of the v2 (sum) and v2m
(min/max) kernels on the bench RMAT workload; differences bound the
gather and scatter phases (the residual is streams + per-chunk fixed
cost).  MODE=sum|mm, SWEEP_SCALE, SWEEP_REPS as in sweep_spmv2.py.
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
    from graphmat_tpu.utils.generators import rmat_edgelist

    mode = os.environ.get("SWEEP_MODE", "mm")
    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    reps = int(os.environ.get("SWEEP_REPS", "50"))
    family = os.environ.get("SWEEP_FAMILY", "rmat")

    if family != "rmat":
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_families import gen_family
        e = gen_family(family, 16 << scale)
    else:
        e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    senders0, receivers0, vals = g._host_edges["dst"]
    nnz = len(senders0)

    if mode in ("usum", "umin"):
        from graphmat_tpu.ops.pallas_spmv2u import (_spmv2u_call,
                                                    build_spmv2u_plan,
                                                    plan_call_args)
        t0 = time.time()
        env_w = os.environ.get("SWEEP_WINDOWS")
        env_cm = os.environ.get("SWEEP_CELL_MIN")
        if env_w or env_cm:
            kw = {}
            if env_w:
                kw["windows"] = tuple(int(x) for x in env_w.split(","))
            if env_cm:
                kw["cell_min"] = int(env_cm)
            plan = build_spmv2u_plan(senders0, receivers0, vals,
                                     g.n_pad, n_recv=g.n_pad, **kw)
        else:
            plan = g.pallas_plan2u("dst")
        print(f"plan build {time.time() - t0:.1f}s nc={plan.nc} "
              f"fill={plan.fill:.3f} wr={plan.wr} h={plan.h} "
              f"h_src={plan.h_src} aux={plan.aux is not None} "
              f"segs={len(plan.splits)}", flush=True)
        arrays, static = plan_call_args(plan)
        kind = "sum" if mode == "usum" else "min"

        # host-side plan composition: per-class sub counts, fresh-window
        # DMA bytes, and granule-walk steps — identifies whether the
        # gather phase is DMA- or walk-bound before touching the device
        kb = (np.concatenate([np.asarray(k) for k in plan.kb])
              if isinstance(plan.kb, tuple) else np.asarray(plan.kb))
        kbu = kb.view(np.uint32)
        kd = (kbu >> 24) & 15
        same = (kbu & (1 << 22)) != 0
        names = ["hub"] + [f"W{w}" for w in plan.classes]
        wlens = [16] + list(plan.classes)
        tot_dma = tot_steps = 0
        for k, (nm, W) in enumerate(zip(names, wlens)):
            m = kd == k
            fresh = int((m & ~same).sum()) if k else 0
            dma = fresh * W * 512
            steps = int(m.sum()) * (W // 8)
            tot_dma += dma
            tot_steps += steps
            print(f"  class {nm:>6}: subs={int(m.sum()):7d} "
                  f"fresh_dma={fresh:7d} ({dma/1e9:6.2f} GB) "
                  f"walk={steps/1e6:7.1f}M granule-steps", flush=True)
        print(f"  TOTAL window DMA {tot_dma/1e9:.2f} GB/iter, "
              f"walk {tot_steps/1e6:.1f}M granule-steps/iter", flush=True)
        tb = (np.concatenate([np.asarray(t) for t in plan.tb])
              if isinstance(plan.tb, tuple) else np.asarray(plan.tb))
        if tb is not None and len(tb):
            tbu = tb.view(np.uint32)
            sp_all = np.empty(len(tb) * 2, np.int64)
            sp_all[0::2] = (tbu >> 8) & 255    # tile 2w span-1
            sp_all[1::2] = (tbu >> 24) & 255   # tile 2w+1 span-1
            sp_all += 1
            tile_kd = np.repeat(kd, 4)         # 4 tiles per 32-row sub
            wt = tile_kd > 0
            if wt.any():
                print(f"  bounded walk {sp_all[wt].sum()/1e6:.2f}M "
                      f"tile-granule-steps (mean span "
                      f"{sp_all[wt].mean():.1f})", flush=True)
        if os.environ.get("SWEEP_STATS_ONLY"):
            return

        def timed(debug):
            # slope method (PERF round 4a): per-iter = (t(4R)-t(R))/3R —
            # a single rep count folds the ~25 ms tunnel dispatch tax in
            def make(nreps):
                @jax.jit
                def chain(arrays, x):
                    def one(x, _):
                        y = _spmv2u_call(arrays, static, x, kind,
                                         _identity_process, False,
                                         debug=debug)
                        ypad = jnp.pad(
                            y, (0, plan.n_send_pad - y.shape[0])) \
                            if y.shape[0] < plan.n_send_pad \
                            else y[: plan.n_send_pad]
                        return ypad * 0.99 + 0.01, 0.0
                    out, _ = jax.lax.scan(one, x, None, length=nreps)
                    return out
                return chain

            x0 = jnp.ones(plan.n_send_pad, jnp.float32)
            ts = {}
            for nreps in (reps, 4 * reps):
                ch = make(nreps)
                float(ch(arrays, x0)[0])
                best_t = np.inf
                for trial in range(4):
                    t0 = time.perf_counter()
                    float(ch(arrays, x0)[0])
                    dt = time.perf_counter() - t0
                    if trial:
                        best_t = min(best_t, dt)
                ts[nreps] = best_t
            best = (ts[4 * reps] - ts[reps]) / (3 * reps)
            print(f"  {debug or 'full'}: {best * 1e3:.2f} ms/iter "
                  f"(slope; intercept "
                  f"{(ts[reps] - reps * best) * 1e3:.1f} ms)", flush=True)
            return best

        full = timed(None)
        nog = timed("nogather")
        nod = timed("nodma")
        print(f"full      {full*1e3:6.2f} ms/iter "
              f"({nnz/full/1e9:.2f} GTEPS)")
        print(f"nogather  {nog*1e3:6.2f} ms/iter  "
              f"-> gather ~{(full-nog)*1e3:.2f} ms")
        print(f"nodma     {nod*1e3:6.2f} ms/iter  "
              f"-> window DMA ~{(full-nod)*1e3:.2f} ms, "
              f"walk+route ~{(nod-nog)*1e3:.2f} ms")
        return

    if mode == "mm":
        plan = build_spmv2m_plan(senders0, receivers0, vals, g.n_pad,
                                 n_recv=g.n_pad)
        arrays = (plan.kindid, plan.blkid, plan.base, plan.ngran,
                  plan.rowmask, plan.pk, plan.val)
    else:
        plan = build_spmv2_plan(senders0, receivers0, vals, g.n_pad,
                                n_recv=g.n_pad)
        arrays = (plan.kindid, plan.blkid, plan.base, plan.kind2,
                  plan.base2, plan.pk, plan.val)
    static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
              plan.classes, plan.rows)
    print(f"mode={mode} nnz={nnz} nc={plan.nc} fill={plan.fill:.3f}")

    def timed(debug):
        @jax.jit
        def chain(arrays, x):
            def one(x, _):
                if mode == "mm":
                    y = _spmv2m_call(arrays, static, x, "min",
                                     _identity_process, False, debug=debug)
                else:
                    y = _spmv2_call(arrays, static, x, _identity_process,
                                    2, False, debug=debug)
                return y[: plan.n_send_pad] * 0.99 + 0.01, 0.0
            out, _ = jax.lax.scan(one, x, None, length=reps)
            return out

        x0 = jnp.ones(plan.n_send_pad, jnp.float32)
        float(chain(arrays, x0)[0])
        best = np.inf
        for trial in range(4):
            t0 = time.perf_counter()
            float(chain(arrays, x0)[0])
            dt = (time.perf_counter() - t0) / reps
            if trial:
                best = min(best, dt)
        return best

    full = timed(None)
    nog = timed("nogather")
    nos = timed("noscatter")
    print(f"full      {full*1e3:6.2f} ms/iter ({nnz/full/1e9:.2f} GTEPS)")
    print(f"nogather  {nog*1e3:6.2f} ms/iter  -> gather ~{(full-nog)*1e3:.2f} ms")
    print(f"noscatter {nos*1e3:6.2f} ms/iter  -> scatter ~{(full-nos)*1e3:.2f} ms")
    print(f"residual (streams+fixed) ~{(nog+nos-full)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
