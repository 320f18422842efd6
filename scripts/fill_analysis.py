"""Host-side fill decomposition for the v2r (sum) and v2m (min/max) plans.

Answers: where do empty slots come from — per-cell row granularity
(tails), sender-registration lane conflicts, receiver-lane binding (mm),
or per-block half pairing?  Pure numpy over plan planes; no TPU needed.
"""

import os
import sys
import time

import numpy as np


def occ_stats(name, pk, rows, wr, blkid, kindid):
    pku = pk.astype(np.uint32)
    rcf = (pku & 0x3FFF).astype(np.int32)
    occ = rcf != wr                       # [nc, rows, 128]
    nc = pk.shape[0]
    tot = occ.sum()
    cap = nc * rows * 128
    per_chunk = occ.reshape(nc, -1).sum(1)
    per_row = occ.sum(2)                  # [nc, rows] slots used per row
    rows_used = (per_row > 0).sum(1)      # rows with any slot
    # waste split: (a) rows entirely empty, (b) partially-filled rows
    empty_row_waste = (rows - rows_used).sum() * 128
    partial_row_waste = (rows_used * 128 - occ.reshape(nc, rows, 128)
                         .sum((1, 2)) * 0).sum()  # placeholder
    partial_row_waste = ((per_row > 0) * (128 - per_row)).sum()
    print(f"{name}: nc={nc} fill={tot/cap:.3f} "
          f"slots={tot} cap={cap}")
    print(f"  waste: empty-rows {empty_row_waste/cap:.3f} "
          f"partial-rows {partial_row_waste/cap:.3f}")
    # by kind
    for kd in np.unique(kindid):
        m = kindid == kd
        ctot = occ[m].sum()
        ccap = m.sum() * rows * 128
        print(f"  kind {kd}: nc={m.sum()} fill={ctot/ccap:.3f} "
              f"share_of_waste={(ccap-ctot)/(cap-tot):.3f}")
    # per-chunk occupancy histogram (deciles)
    qs = np.percentile(per_chunk, [5, 25, 50, 75, 95]) / (rows * 128)
    print(f"  chunk fill pctl 5/25/50/75/95: "
          + "/".join(f"{q:.2f}" for q in qs))
    return occ, per_row


def main():
    from graphmat_tpu import Graph
    from graphmat_tpu.ops.pallas_spmv2 import (build_spmv2_plan,
                                               build_spmv2m_plan)
    from graphmat_tpu.utils.generators import rmat_edgelist

    scale = int(os.environ.get("SWEEP_SCALE", "20"))
    e = rmat_edgelist(scale, 16, seed=1)
    g = Graph(e, build_in_edges=False, permute="degree")
    senders0, receivers0, vals = g._host_edges["dst"]
    print(f"nnz={len(senders0)} n_pad={g.n_pad}")

    t0 = time.time()
    p = build_spmv2_plan(senders0, receivers0, vals, g.n_pad,
                         n_recv=g.n_pad)
    print(f"sum plan build {time.time()-t0:.1f}s classes={p.classes} "
          f"hub={p.hub} rows={p.rows} nb={p.nb}")
    occ, per_row = occ_stats("sum", np.asarray(p.pk), p.rows, p.wr,
                             np.asarray(p.blkid), np.asarray(p.kindid))
    # sender-registration pressure: how many distinct senders registered
    # per (row, lane)?  hi2 plane is per-lane registration.
    t0 = time.time()
    pm = build_spmv2m_plan(senders0, receivers0, vals, g.n_pad,
                           n_recv=g.n_pad)
    print(f"mm plan build {time.time()-t0:.1f}s classes={pm.classes} "
          f"rows={pm.rows} nb={pm.nb}")
    occm, per_rowm = occ_stats("mm", np.asarray(pm.pk), pm.rows, pm.wr,
                               np.asarray(pm.blkid), np.asarray(pm.kindid))
    rm = np.asarray(pm.rowmask)
    print(f"mm row-mode chunks: {(rm != 0).sum()} of {len(rm)}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    main()
