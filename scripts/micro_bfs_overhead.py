"""Microbenchmarks for the BFS per-level fixed costs (PERF round 4).

Times, each dependence-chained inside one jitted scan:
  1. trivial while-loop-shaped body (1M i32 carry, one add)
  2. any-reduce [8192,128] bool -> [8192]
  3. cumsum over [8192] i32
  4. lax.cummax over [1454] i32
  5. take of 5816 indices from a [13185] table
  6. window-activity tables: 5x (reshape+any) + one take  (the
     cumsum-free activity candidate)
Env: SWEEP_REPS (200).
"""

import os
import time

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    reps = int(os.environ.get("SWEEP_REPS", "200"))
    h, hc, ncs, nc = 8192, 4992, 5816, 1454
    rng = np.random.default_rng(0)

    def chain(body, x0):
        @jax.jit
        def run(x0):
            def one(x, _):
                return body(x), 0.0
            out, _ = jax.lax.scan(one, x0, None, length=reps)
            return out
        run(x0).block_until_ready()
        return timed(lambda: run(x0).block_until_ready(), reps)

    x1m = jnp.zeros(1 << 20, jnp.int32)
    t = chain(lambda x: x + 1, x1m)
    print(f"trivial body      {t*1e6:7.1f} us/iter")

    xb = jnp.asarray(rng.random((h, 128)) < 0.01)
    t = chain(lambda x: x ^ jnp.any(x, axis=1)[:, None], xb)
    print(f"any [8192,128]    {t*1e6:7.1f} us/iter")

    xi = jnp.ones(h, jnp.int32)
    t = chain(lambda x: x + (jnp.cumsum(x)[-1] >> 30), xi)
    print(f"cumsum [8192]     {t*1e6:7.1f} us/iter")

    xc = jnp.ones(nc, jnp.int32)
    t = chain(lambda x: x + (jax.lax.cummax(x)[-1] >> 30), xc)
    print(f"cummax [1454]     {t*1e6:7.1f} us/iter")

    tab = jnp.ones(h + hc + 1, jnp.int32)
    idx = jnp.asarray(rng.integers(0, h + hc, ncs).astype(np.int32))
    t = chain(lambda x: x + (jnp.take(x, idx).sum() >> 30), tab)
    print(f"take 5816/13185   {t*1e6:7.1f} us/iter")

    # window tables: hub(16 rows, 1 entry) + 160/256/1024/2048 classes
    Ws = [160, 256, 1024, 2048]
    offs = [1]
    for W in Ws:
        offs.append(offs[-1] + -(-h // W))
    aidx = jnp.asarray(rng.integers(0, offs[-1], ncs).astype(np.int32))

    def wact_body(rowmask):
        parts = [jnp.any(rowmask[:16]).reshape(1)]
        for W in Ws:
            hp = -(-h // W) * W
            rp = jnp.pad(rowmask, (0, hp - h))
            parts.append(jnp.any(rp.reshape(-1, W), axis=1))
        wact = jnp.concatenate(parts)
        sub = jnp.take(wact, aidx)
        return rowmask ^ ((sub.sum() >> 30) > 0)

    xm = jnp.asarray(rng.random(h) < 0.01)
    t = chain(wact_body, xm)
    print(f"window tables     {t*1e6:7.1f} us/iter")

    # one-hot matmul gather: idx [5816] from a ~1024-entry table
    tab1k = jnp.ones(1024, jnp.float32)
    idx1k = jnp.asarray(rng.integers(0, 1024, ncs).astype(np.int32))
    iota1k = jnp.arange(1024, dtype=jnp.int32)

    def onehot_body(tabv):
        oh = (idx1k[:, None] == iota1k[None, :]).astype(jnp.bfloat16)
        got = oh @ tabv.astype(jnp.bfloat16)
        return tabv + (got.sum().astype(jnp.int32) >> 30)

    t = chain(onehot_body, tab1k)
    print(f"onehot gather     {t*1e6:7.1f} us/iter")

    # combined current-style acteff (cumsum + takes + cummax)
    vlo = jnp.asarray(rng.integers(0, h, hc).astype(np.int32))
    vhi = jnp.minimum(vlo + 1024, h)
    alo = jnp.asarray(rng.integers(0, h + hc, ncs).astype(np.int32))
    ahi = jnp.minimum(alo + 160, h + hc)

    def acteff_body(rowact):
        pref = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(rowact)])
        vact = (jnp.take(pref, vhi) - jnp.take(pref, vlo)) > 0
        pref = jnp.concatenate([pref,
                                pref[-1] + jnp.cumsum(
                                    vact.astype(jnp.int32))])
        sub = (jnp.take(pref, ahi) - jnp.take(pref, alo)) > 0
        cact = jnp.any(sub.reshape(nc, 4), axis=1)
        idxs = jnp.arange(nc, dtype=jnp.int32)
        eff = jax.lax.cummax(jnp.where(cact, idxs, -1))
        return rowact + (eff[-1] >> 30)

    xr = jnp.asarray((rng.random(h) < 0.01).astype(np.int32))
    t = chain(acteff_body, xr)
    print(f"acteff (current)  {t*1e6:7.1f} us/iter")


if __name__ == "__main__":
    main()
