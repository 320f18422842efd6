"""A/B: fused got plane vs the round-1 double-SpMV for ACTIVE_ONLY sum.

Measures, dependence-chained on one chip (RMAT workload, dense frontier —
the worst case for chunk skipping, so the numbers isolate the got cost):

  a) value-only SpMV            (lower bound: a got-free iteration)
  b) value SpMV + sentf SpMV    (round-1 engine behavior)
  c) fused want_got SpMV        (round-2: one launch, extra count plane)
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2 import (_identity_process,
                                               _spmv2_call, build_spmv2_plan,
                                               encode_sent_bit)
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    reps = int(os.environ.get("SWEEP_REPS", "50"))
    ns = int(os.environ.get("SWEEP_NS", "2"))

    t0 = time.time()
    e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    senders0, receivers0, vals = g._host_edges["dst"]
    nnz = len(senders0)
    print(f"prep: {time.time() - t0:.1f}s nnz={nnz}", flush=True)

    plan = build_spmv2_plan(senders0, receivers0, vals, g.n_pad,
                            n_recv=g.n_pad)
    arrays = (plan.kindid, plan.blkid, plan.base, plan.kind2,
              plan.base2, plan.pk, plan.val)
    static = (plan.h, plan.wr, plan.nb, plan.nc, plan.n_pad,
              plan.classes, plan.rows)
    sent = jnp.ones(plan.n_send_pad, bool)

    def variant(mode):
        @jax.jit
        def chain(arrays, sent, x):
            def one(x, _):
                if mode == "fused":
                    xe = encode_sent_bit(x, sent)
                    y, cnt = _spmv2_call(arrays, static, xe,
                                         _identity_process, ns, False,
                                         sent=sent, want_got=True)
                    y = y + 0.0 * cnt          # keep got live
                elif mode == "double":
                    y = _spmv2_call(arrays, static, x, _identity_process,
                                    ns, False, sent=sent)
                    got = _spmv2_call(arrays, static,
                                      jnp.where(sent, 1.0, 0.0),
                                      _identity_process, ns, False,
                                      sent=sent)
                    y = y + 0.0 * got
                else:
                    y = _spmv2_call(arrays, static, x, _identity_process,
                                    ns, False, sent=sent)
                xn = jnp.zeros(plan.n_send_pad, jnp.float32)
                xn = xn.at[: plan.n_pad].set(y * 0.99 + 0.01)
                return xn, 0.0
            out, _ = jax.lax.scan(one, x, None, length=reps)
            return out
        return chain

    x0 = jnp.ones(plan.n_send_pad, jnp.float32)
    for mode in ("value", "double", "fused"):
        chain = variant(mode)
        float(chain(arrays, sent, x0)[0])       # warm the executable
        best = np.inf
        for trial in range(4):
            t0 = time.perf_counter()
            float(chain(arrays, sent, x0)[0])
            dt = (time.perf_counter() - t0) / reps
            if trial:
                best = min(best, dt)
        print(f"{mode:>6}: {best * 1e3:6.2f} ms/iter "
              f"({nnz / best / 1e9:.2f} GTEPS)", flush=True)


if __name__ == "__main__":
    main()
