"""Estimate achievable fill for the proposed v2u layout (routed slots +
out-lane double-gather scatter) from per-cell lower bounds:

rows_cell >= max( ceil(E/128)                     # physical slots
                , max_l sum_{r@lane l} ceil(d_r/K) # out-lane capacity K
                , max_l #senders@lane l needing registration )

Row-mode extraction (in-cell receiver degree >= RM) removes hot receivers
into dedicated full rows first.  Compares K=1 (the current mm binding)
vs K=2/K=3, and reports the resulting chunk count vs today's plans.
"""

import os

import numpy as np


def main():
    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2 import _classify
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    wr, hub, cell_min = 4096, 2048, 4000
    windows = (160, 256, 1024, 2048)
    RM = int(os.environ.get("RM", "129"))

    e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    s, r, _ = g._host_edges["dst"]
    s = np.asarray(s, np.int64)
    r = np.asarray(r, np.int64)
    n = g.n_pad
    LANE = 128
    h = max(-(-(-(-n // LANE)) // LANE) * LANE, LANE)  # round n/128 up to 128
    h = max(((n + LANE - 1) // LANE + LANE - 1) // LANE * LANE, LANE)
    nb = (n + wr - 1) // wr
    rblk = r // wr
    kind, cellk, basew, gidx = _classify(s, r, rblk, h, nb, wr, hub,
                                         list(windows), cell_min)
    E = len(s)
    print(f"nnz={E} cells classified")

    order = np.lexsort((s, cellk))
    so, ro, ck = s[order], r[order], cellk[order]
    bnd = np.r_[0, np.flatnonzero(ck[1:] != ck[:-1]) + 1, E]

    for K in (1, 2, 3):
        tot_rows = 0
        tot_rm_rows = 0
        binds = {"phys": 0, "recv": 0, "send": 0}
        for ci in range(len(bnd) - 1):
            lo, hi = bnd[ci], bnd[ci + 1]
            se, re_ = so[lo:hi], ro[lo:hi]
            m = hi - lo
            # receiver degrees in cell
            ur, dcnt = np.unique(re_, return_counts=True)
            hot = dcnt >= RM
            rm_edges = dcnt[hot].sum()
            rm_rows = int(np.ceil(dcnt[hot] / 128).sum())
            cold = m - rm_edges
            # cold receiver lane load
            rl = ur[~hot] % 128
            load = np.bincount(rl, weights=np.ceil(dcnt[~hot] / K),
                               minlength=128)
            # sender registration load: senders (unique) per lane; a
            # sender with T edges needs ~ceil(T/128) regs minimum
            us, scnt = np.unique(se, return_counts=True)
            sload = np.bincount(us % 128, weights=np.ceil(scnt / 128),
                                minlength=128)
            phys = int(np.ceil(cold / 128))
            rneed = int(load.max()) if len(rl) else 0
            sneed = int(sload.max())
            rows = max(phys, rneed, sneed)
            which = ("phys" if rows == phys else
                     "recv" if rows == rneed else "send")
            binds[which] += 1
            # round to half granularity (16 rows)
            tot_rows += -(-rows // 16) * 16
            tot_rm_rows += rm_rows
        cap = (tot_rows + -(-tot_rm_rows // 16) * 16) * 128
        fill = E / cap
        nc64 = cap / (64 * 128)
        print(f"K={K} RM={RM}: est fill={fill:.3f} "
              f"rows={tot_rows}+rm{tot_rm_rows} -> nc(rows=64)~{nc64:.0f} "
              f"binds={binds}")


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    main()
