"""Estimate the win of a receiver-side 'block fully visited' chunk skip
for the packed-key BFS (min-plus value iteration).

Exact host simulation on the bench RMAT graph: per iteration, compute
(a) the chunks the shipping sender-activity test keeps, and (b) how many
of those target a receiver block whose rows are ALL already visited —
updates there are pure same-depth parent refinements (depths are final
on first touch for unit weights + exact-distance shortcuts), so a
receiver-gated kernel can skip them.  Prints a per-iteration table and
the aggregate active-chunk reduction.

Usage: JAX_PLATFORMS=cpu python scripts/bfs_recv_skip_est.py [scale]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from graphmat_tpu import Graph
    from graphmat_tpu.apps.bfs import (INF_KEY, KEY_BIAS,
                                       build_bfs_shortcuts)
    from graphmat_tpu.utils.generators import rmat_edgelist

    e = rmat_edgelist(scale, 16, seed=1)
    e_aug, pred0, ind1 = build_bfs_shortcuts(e)
    gf = Graph(e_aug, build_in_edges=False, permute="degree")
    bits = max(int(np.ceil(np.log2(gf.n_pad))), 1)

    plan = gf.pallas_plan2u("dst")
    nc, S = plan.nc, max(plan.rows // 32, 1)

    def _cat(a):
        if isinstance(a, (tuple, list)):
            return np.concatenate([np.asarray(x).ravel() for x in a])
        return np.asarray(a).ravel()
    blkid = _cat(plan.blkid)
    act_lo = _cat(plan.act_lo)
    act_hi = _cat(plan.act_hi)
    h, wr = plan.h, plan.wr
    h_src = plan.h_src or h
    print(f"n_pad={plan.n_pad} nc={nc} S={S} wr={wr} h_src={h_src} "
          f"h={h} nb={plan.nb}")

    # internal-order edges
    perm = np.asarray(gf.perm)
    src_i = perm[np.asarray(e_aug.src, np.int64) - 1]
    dst_i = perm[np.asarray(e_aug.dst, np.int64) - 1]
    w = np.asarray(e_aug.val, np.int64)

    n_pad = plan.n_pad
    rng = np.random.default_rng(7)
    deg_int = np.zeros(n_pad, np.int64)
    odeg = np.bincount(np.asarray(e.src, np.int64) - 1, minlength=gf.n)
    deg_int[perm] = odeg
    cand = np.flatnonzero(deg_int > 0)
    sources = rng.choice(cand, size=8, replace=False).astype(np.int64)

    agg = {"act": 0, "act_skip": 0, "iters": 0}
    for src in sources:
        key = np.full(n_pad, np.int64(INF_KEY))
        key[src] = KEY_BIAS + src
        active = np.zeros(n_pad, bool)
        active[src] = True
        rows_tab = []
        for it in range(128):
            visited = key < INF_KEY
            # receiver-block all-visited (pad rows beyond n count visited:
            # valid_vertex is false there)
            vis_pad = visited.copy()
            vis_pad[gf.n:] = True
            nb = plan.nb
            blk_all = vis_pad[: nb * wr].reshape(nb, wr).all(axis=1)

            # sender-activity chunk test (the shipping one)
            sent = active.copy()
            sentm = sent[: h_src * 128].reshape(h_src, 128)
            rowact = sentm.any(axis=1).astype(np.int64)
            pref = np.concatenate([[0], np.cumsum(rowact)])
            if h > h_src and getattr(plan.aux, "vlo", None) is not None:
                vl = np.asarray(plan.aux.vlo)
                vh = np.asarray(plan.aux.vhi)
                vact = (pref[vh] - pref[vl]) > 0
                pref = np.concatenate(
                    [pref, pref[-1] + np.cumsum(vact.astype(np.int64))])
            sub_act = (np.take(pref, act_hi) - np.take(pref, act_lo)) > 0
            cact = sub_act.reshape(nc, S).any(axis=1)
            skip = blk_all[blkid]
            kept = cact & ~skip
            rows_tab.append((it, int(active.sum()), int(cact.sum()),
                             int(kept.sum())))
            agg["act"] += int(cact.sum())
            agg["act_skip"] += int(kept.sum())
            agg["iters"] += 1

            # relax
            m = active[src_i]
            if not m.any():
                break
            ks = key[src_i[m]]
            ok = (ks >= KEY_BIAS) & (ks < KEY_BIAS + (1 << 28))
            candk = ((ks >> bits) + w[m]) << bits | src_i[m]
            candk = np.where(ok, candk, np.int64(INF_KEY))
            nk = key.copy()
            np.minimum.at(nk, dst_i[m], candk)
            changed = nk < key
            key = nk
            if not changed.any():
                break
            active = changed
        print(f"src={src}: iters={len(rows_tab)}")
        for it, na, ca, ka in rows_tab:
            print(f"  it{it:3d} active={na:8d} chunks_act={ca:6d} "
                  f"after_recv_skip={ka:6d}")
    print(f"AGGREGATE over {len(sources)} sources: active-chunk sum "
          f"{agg['act']} -> {agg['act_skip']} "
          f"({agg['act_skip'] / max(agg['act'], 1):.3f}x)")


if __name__ == "__main__":
    main()
