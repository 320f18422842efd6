"""Bisect the sparse-path activity cost: cumulative variants, each
dependence-chained via a take of the result (fold-proof).  RMAT-20
plan; SWEEP_REPS (200)."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.ops import pallas_spmv2u as u
    from graphmat_tpu.ops.pallas_spmv2u import plan_call_args
    from graphmat_tpu.utils.generators import rmat_edgelist

    reps = int(os.environ.get("SWEEP_REPS", "200"))
    e = rmat_edgelist(int(os.environ.get("SWEEP_SCALE", "20")), 16,
                      seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    plan = g.pallas_plan2u("dst")
    arrays, static = plan_call_args(plan, use_val=False)
    h, wr, nb, nc, n_pad, classes, rows = static[:7]
    h_src = static[8]
    S = max(rows // u.SUBR, 1)
    gm = arrays[11] if len(arrays) > 11 else None
    vm = arrays[12] if len(arrays) > 12 else None
    print(f"h={h} h_src={h_src} nc={nc} gm={None if gm is None else gm.shape}"
          f" vm={None if vm is None else vm.shape}", flush=True)

    def timed(fn, reps, trials=4):
        fn()
        best = np.inf
        for t in range(trials):
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / reps
            if t:
                best = min(best, dt)
        return best

    def chain(body):
        @jax.jit
        def run(sent0):
            def one(sent, _):
                r = body(sent)
                # fold-proof feedback: flip one element by a value the
                # compiler cannot prove constant
                return sent ^ (r > jnp.int32(1 << 30)), 0.0
            out, _ = jax.lax.scan(one, sent0, None, length=reps)
            return out
        sent0 = jnp.zeros(h_src * u.LANE, bool).at[12345].set(True)
        run(sent0).block_until_ready()
        return timed(lambda: run(sent0).block_until_ready(), reps)

    ngran_src = h_src // u.ACT_GRAN
    hcg = (h - h_src) // u.ACT_GRAN

    def v_any(sent):
        sentm = sent.reshape(h_src, u.LANE)
        gact = jnp.any(sentm.reshape(ngran_src, u.ACT_GRAN * u.LANE),
                       axis=1)
        return jnp.sum(gact.astype(jnp.int32))

    def v_vm(sent):
        sentm = sent.reshape(h_src, u.LANE)
        gact = jnp.any(sentm.reshape(ngran_src, u.ACT_GRAN * u.LANE),
                       axis=1)
        vact = jnp.matmul(vm, gact.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) > 0
        return jnp.sum(vact.astype(jnp.int32))

    def gact_full(sent):
        sentm = sent.reshape(h_src, u.LANE)
        gact = jnp.any(sentm.reshape(ngran_src, u.ACT_GRAN * u.LANE),
                       axis=1)
        vact = jnp.matmul(vm, gact.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) > 0
        return jnp.concatenate(
            [gact, jnp.any(vact.reshape(hcg, u.ACT_GRAN), axis=1)])

    def v_gm(sent):
        gact = gact_full(sent)
        sub = jnp.matmul(gm, gact.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) > 0
        return jnp.sum(sub.astype(jnp.int32))

    def v_cact(sent):
        gact = gact_full(sent)
        sub = jnp.matmul(gm, gact.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) > 0
        cact = jnp.any(sub.reshape(nc, S), axis=1)
        return jnp.sum(cact.astype(jnp.int32))

    def v_full(sent):
        gact = gact_full(sent)
        sub = jnp.matmul(gm, gact.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) > 0
        cact = jnp.any(sub.reshape(nc, S), axis=1)
        idxs = jnp.arange(nc, dtype=jnp.int32)
        eff = jnp.maximum(jax.lax.cummax(jnp.where(cact, idxs, -1)), 0)
        return eff[-1] + jnp.sum(cact.astype(jnp.int32))

    for name, body in [("any+granule", v_any), ("+vm matmul", v_vm),
                       ("+gm matmul", v_gm), ("+cact", v_cact),
                       ("+cummax(full)", v_full)]:
        t = chain(body)
        print(f"{name:14s} {t*1e6:7.1f} us/iter", flush=True)


def variants():
    import jax
    import jax.numpy as jnp
    reps = int(os.environ.get("SWEEP_REPS", "200"))
    rng = np.random.default_rng(0)
    M, K = 4992, 256
    vm_b = jnp.asarray(rng.random((M, K)) < 0.1, jnp.bfloat16)
    vm_f = vm_b.astype(jnp.float32)

    def timed(fn, trials=4):
        fn()
        best = np.inf
        for t in range(trials):
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / reps
            if t:
                best = min(best, dt)
        return best

    def chain(body):
        @jax.jit
        def run(g0):
            def one(gact, _):
                r = body(gact)
                return gact ^ (r > jnp.float32(1e30)), 0.0
            out, _ = jax.lax.scan(one, g0, None, length=reps)
            return out
        g0 = jnp.zeros(K, bool).at[3].set(True)
        run(g0).block_until_ready()
        return timed(lambda: run(g0).block_until_ready())

    def mv_bf16(g):
        return jnp.matmul(vm_b, g.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).sum()

    def mv_f32(g):
        return jnp.matmul(vm_f, g.astype(jnp.float32)).sum()

    def mv_t(g):
        return jnp.matmul(g.astype(jnp.float32), vm_f.T).sum()

    def mv_n8(g):
        gg = jnp.broadcast_to(g.astype(jnp.bfloat16)[:, None], (K, 8))
        return jnp.matmul(vm_b, gg,
                          preferred_element_type=jnp.float32)[:, 0].sum()

    def mv_mask(g):
        # masked any: broadcast compare + reduce (no matmul at all)
        return jnp.max(jnp.where(g[None, :], vm_f, 0.0), axis=1).sum()

    for name, body in [("mv bf16 N=1", mv_bf16), ("mv f32 N=1", mv_f32),
                       ("vec@mat.T", mv_t), ("mv N=8", mv_n8),
                       ("mask+rowmax", mv_mask)]:
        t = chain(body)
        print(f"{name:14s} {t*1e6:7.1f} us/iter", flush=True)


if __name__ == "__main__":
    if os.environ.get("SWEEP_VARIANTS"):
        variants()
    else:
        main()
