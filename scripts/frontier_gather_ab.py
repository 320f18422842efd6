"""Frontier-compacted gather A/B (VERDICT r4 #4 — the per-column-skip
analog).

The reference skips inactive columns at single-vertex granularity
(``include/GMDP/singlenode/spmspv.h:48-60``); the v2u TPU layout skips
at 32-row window granularity, and PERF round 4b bounds BFS by
near-full sweeps.  This experiment measures the alternative: compact
the active sender ids on device, expand their CSR slices into a
padded edge batch (searchsorted expansion over a static budget), and
gather/scatter per frontier edge — against the shipping window-skip
min-SpMV at several frontier densities.

Run on the TPU::

    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/frontier_gather_ab.py

Emits one JSON line per (density, path).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2u import (_identity_process,
                                                _spmv2u_call,
                                                encode_sent_bit,
                                                plan_call_args)
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("FGA_SCALE", "20"))
    e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    plan = g.pallas_plan2u("dst")
    n = g.n
    n_pad = g.n_pad

    # sender-sorted CSR on device (the frontier-indexed layout)
    s0 = np.asarray(g._host_edges["dst"][0])
    r0 = np.asarray(g._host_edges["dst"][1])
    if g.perm is not None:
        p = np.asarray(g.perm)
        s0, r0 = p[s0], p[r0]
    order = np.argsort(s0, kind="stable")
    s_s, r_s = s0[order], r0[order]
    deg = np.bincount(s_s, minlength=n_pad).astype(np.int32)
    off = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    dev = {
        "r_s": jnp.asarray(r_s.astype(np.int32)),
        "off": jnp.asarray(off),
        "deg": jnp.asarray(deg),
    }
    m = len(s_s)
    rng = np.random.default_rng(3)

    INF = np.float32(3.0e38)

    def compacted(active, F, EB):
        """Frontier-compacted min-SpMV: ids = flatnonzero(active)[:F],
        expand CSR slices into an EB-edge padded batch, gather + scatter-
        min.  F/EB are static budgets (shape caps)."""
        @jax.jit
        def run(active, x):
            ids = jnp.flatnonzero(active, size=F, fill_value=n_pad - 1)
            valid = jnp.arange(F) < jnp.sum(active.astype(jnp.int32))
            d = jnp.where(valid, dev["deg"][ids], 0)
            o = dev["off"][ids]
            pos = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(d)])
            tot = pos[-1]
            k = jnp.arange(EB, dtype=jnp.int32)
            src_slot = jnp.searchsorted(pos, k, side="right") - 1
            src_slot = jnp.minimum(src_slot, F - 1)
            eidx = o[src_slot] + (k - pos[src_slot])
            live = k < tot
            eidx = jnp.where(live, eidx, 0)
            recv = jnp.where(live, dev["r_s"][eidx], n_pad)
            msg = jnp.where(live, x[ids[src_slot]] + 1.0, INF)
            y = jnp.full(n_pad + 1, INF).at[recv].min(msg)
            return y[:n_pad]
        return run

    args_p, static_p = plan_call_args(plan)

    @jax.jit
    def _enc(active, x):
        return encode_sent_bit(jnp.where(active, x + 1.0, INF), active)

    def windowed(active, x):
        # _spmv2u_call is itself jitted and takes the plan arrays as
        # ARGUMENTS — an outer jit would bake them into the compile
        # payload (the axon remote-compile endpoint rejects it at 413)
        return _spmv2u_call(args_p, static_p, _enc(active, x), "min",
                            _identity_process, False, sent=active)

    x = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    for dens in (0.001, 0.01, 0.1):
        act_np = np.zeros(n_pad, bool)
        act_np[rng.choice(n, max(int(n * dens), 1), replace=False)] = True
        active = jnp.asarray(act_np)
        F = int(n * dens * 1.5) // 256 * 256 + 256
        EB = int(m * dens * 4) // 1024 * 1024 + 1024
        comp = compacted(active, F, EB)

        recs = {}
        for name, fn in (("windowed", lambda: windowed(active, x)),
                         ("compacted", lambda: comp(active, x))):
            r = fn()
            _ = float(jnp.asarray(r).reshape(-1)[0])   # warm
            reps = 30
            t0 = time.time()
            for _i in range(reps):
                r = fn()
            _ = float(jnp.asarray(r).reshape(-1)[0])
            ms = (time.time() - t0) / reps * 1000
            recs[name] = ms
            print(json.dumps({"density": dens, "path": name,
                              "ms_per_level": round(ms, 3),
                              "F": F, "EB": EB}), flush=True)
        # correctness: compacted path vs a numpy min-plus oracle (the
        # windowed output carries the fused got-bit encoding, so it is
        # not directly comparable bit-for-bit)
        yc = np.asarray(comp(active, x))
        want = np.full(n_pad, np.float64(INF))
        xm = np.asarray(x)
        am = np.flatnonzero(act_np)
        sel = np.isin(s_s, am)
        np.minimum.at(want, r_s[sel], xm[s_s[sel]] + 1.0)
        wm = want < INF / 2
        np.testing.assert_allclose(yc[wm], want[wm], rtol=1e-5)
        print(json.dumps({"density": dens,
                          "speedup_compacted": round(
                              recs["windowed"] / recs["compacted"], 2)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
