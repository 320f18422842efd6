"""Pallas TPU generalized-SpMV for K-wide vector messages (3-operand path).

Covers the reference's SpMSpV3 workloads with K-dim payloads — SGD
collaborative filtering and LDA (``src/SGD.cpp:95-117``,
``src/LDA.cpp:128-158``): every edge gathers the sender's K-vector and the
receiver's K-vector, combines them through a user ⊗, and sum-reduces
K-vectors per receiver.

Reuses :func:`graphmat_tpu.ops.pallas_spmv.build_spmv_plan` edge plans
unchanged; what differs from the scalar kernel:

* **x layout**: ``[h, planes * 128]`` bf16 where planes = K * x_splits
  (k-major) — one window DMA per row covers every plane, and the gather
  matmul amortizes its one-hot across all planes;
* **receiver vectors**: laid out ``[nb, K_pad, wr]`` and block-fetched with
  the output window; gathered per edge by reusing the scatter one-hots
  (``vpr = Σ_g VPwin[:, g] @ ohlo_g``);
* **⊗**: ``process(xv, ev, vpr, extra, rid) -> p`` on ``[K, e]`` tiles —
  e.g. SGD's ``p = xv * (ev − Σ_k xv·vpr)``; ``rid`` carries global
  receiver ids (LDA's doc/term split), ``extra`` a broadcast state tile;
* **scatter**: the factored group one-hots contract ``[K, e]`` against
  ``[128, e]`` — one matmul per group per split, K-wide for free.

f32 exactness to ~2^-17 via 2-way bf16 splits on both x and vp (configure
``x_splits``/``vp_splits``; 1 = plain bf16 for speed).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv import LANE, ROWS_PER_CHUNK, SpmvPlan

__all__ = ["spmv_vec"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _split_planes(a, n_splits):
    """[n, K] f32 -> [n, K*n_splits] bf16, k-major plane order."""
    outs = []
    rem = a
    for s in range(n_splits):
        if s < n_splits - 1:
            u = jax.lax.bitcast_convert_type(rem, jnp.uint32)
            hi = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000),
                                              jnp.float32)
            outs.append(hi.astype(jnp.bfloat16))
            rem = rem - hi
        else:
            outs.append(rem.astype(jnp.bfloat16))
    # k-major: plane index = k * n_splits + s
    return jnp.stack(outs, axis=2).reshape(a.shape[0], -1)


def _make_vec_kernel(process: Callable, wr: int, h: int, row_e: int,
                     win: int, k: int, k_pad: int, x_splits: int,
                     vp_splits: int, has_vp: bool, has_extra: bool):
    planes = k * x_splits

    def kernel(blk_ref, hiabs_ref, slo_ref, rrel_ref, vals_ref, mask_ref,
               xb_ref, *rest):
        idx = 0
        vp_ref = extra_ref = None
        if has_vp:
            vp_ref = rest[idx]; idx += 1
        if has_extra:
            extra_ref = rest[idx]; idx += 1
        y_ref, acc_ref = rest[idx], rest[idx + 1]
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        iota_we = jax.lax.broadcasted_iota(jnp.int32, (win, row_e), 0)
        iota_le = jax.lax.broadcasted_iota(jnp.int32, (LANE, row_e), 0)

        def row(rr, _):
            habs = hiabs_ref[0, rr, :].reshape(1, row_e)
            base = jnp.minimum((jnp.min(habs) // 8) * 8, h - win)
            base = pl.multiple_of(base, 8)
            oh = ((habs - base) == iota_we).astype(jnp.bfloat16)  # [win, e]
            xw = xb_ref[pl.ds(base, win), :]                # [win, planes*128]
            m_all = jax.lax.dot_general(xw, oh, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            # lane extraction per plane (rank-2 ops only — rank-3 masked
            # reduces hit Mosaic relayout bugs)
            slo_row = slo_ref[0, rr, :].reshape(1, row_e)
            lane_sel = iota_le == slo_row                      # [128, e]
            rows_k = []
            for kk in range(k):
                acc_k = None
                for s in range(x_splits):
                    pidx = kk * x_splits + s
                    mp = m_all[pidx * LANE:(pidx + 1) * LANE, :]
                    t = jnp.sum(jnp.where(lane_sel, mp, 0.0), axis=0,
                                keepdims=True)                 # [1, e]
                    acc_k = t if acc_k is None else acc_k + t
                rows_k.append(acc_k)
            xv = jnp.concatenate(rows_k, axis=0)               # [K, e]

            rc = rrel_ref[0, rr, :].reshape(1, row_e)
            rc_lo = rc & 127
            rc_hi = rc >> 7
            ohlo = (iota_le == rc_lo).astype(jnp.bfloat16)     # [128, e]
            ngroups = wr // LANE
            gmasks = [(rc_hi == g) for g in range(ngroups)]

            vpr = None
            if has_vp:
                # gather receiver vectors via the scatter one-hots:
                # vp_ref block is [1, k_pad*vp_splits, wr]
                vpw = vp_ref[0]                                # [kp*vs, wr]
                vpr_acc = None
                for g in range(ngroups):
                    ohg = jnp.where(gmasks[g], ohlo, 0)        # [128, e]
                    vpw_g = vpw[:, g * LANE:(g + 1) * LANE]    # [kp*vs, 128]
                    t = jax.lax.dot_general(
                        vpw_g.astype(jnp.bfloat16), ohg,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [kp*vs, e]
                    vpr_acc = t if vpr_acc is None else vpr_acc + t
                if vp_splits > 1:
                    vpr = vpr_acc.reshape(k_pad, vp_splits,
                                          row_e).sum(axis=1)[:k]
                else:
                    vpr = vpr_acc[:k]                          # [K, e]

            ev = vals_ref[0, rr, :].reshape(1, row_e)
            msk = mask_ref[0, rr, :].reshape(1, row_e)
            extra = extra_ref[:] if has_extra else None
            # global receiver ids (for id-partitioned programs like LDA)
            rid = blk_ref[i] * wr + rc                           # [1, e]
            p = process(xv, ev, vpr, extra, rid).astype(jnp.float32)
            p = p * msk

            # factored scatter, K rows per matmul
            contribs = []
            for g in range(ngroups):
                pg = jnp.where(gmasks[g], p, 0.0)
                pu = jax.lax.bitcast_convert_type(pg, jnp.uint32)
                phf = jax.lax.bitcast_convert_type(
                    pu & np.uint32(0xFFFF0000), jnp.float32)
                parts = (phf.astype(jnp.bfloat16),
                         (pg - phf).astype(jnp.bfloat16))
                acc_g = None
                for part in parts:
                    t = jax.lax.dot_general(part, ohlo,
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    acc_g = t if acc_g is None else acc_g + t  # [K, 128]
                contribs.append(acc_g)
            contrib = jnp.concatenate(contribs, axis=1)        # [K, wr]
            if k_pad > k:
                pad = jnp.zeros((k_pad - k, wr), jnp.float32)
                contrib = jnp.concatenate([contrib, pad], axis=0)
            acc_ref[:] = acc_ref[:] + contrib
            return 0

        jax.lax.fori_loop(0, ROWS_PER_CHUNK, row, 0)
        y_ref[0] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("plan_static", "process",
                                             "k", "x_splits", "vp_splits",
                                             "interpret"))
def _spmv_vec_call(plan_arrays, plan_static, x, vp_r, extra, process, k,
                   x_splits, vp_splits, interpret):
    nc, nb, wr, h, n_pad, row_e, win = plan_static
    blkid, hiabs, slo, rrel, vals, mask = plan_arrays
    k_pad = max(_round_up(k, 8), 8)
    has_vp = vp_r is not None

    # x: [n_send_pad, K] -> [h, planes*128] bf16, lane-major per plane
    planes = k * x_splits
    xs = _split_planes(x, x_splits)            # [n, K*xs] k-major
    # reorganize to [h, planes, 128] -> [h, planes*128]
    xb = xs.reshape(h, LANE, planes).transpose(0, 2, 1).reshape(
        h, planes * LANE)

    args = [blkid, hiabs, slo, rrel, vals, mask, xb]
    in_specs = [pl.BlockSpec((1, ROWS_PER_CHUNK, row_e),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM)] * 5 + [
        pl.BlockSpec(memory_space=pltpu.VMEM)]
    if has_vp:
        vps = _split_planes(vp_r, vp_splits)   # [n_pad_recv, K*vs]
        kv = k_pad * vp_splits
        pad_cols = kv - vps.shape[1]
        if pad_cols:
            vps = jnp.pad(vps, ((0, 0), (0, pad_cols)))
        npr = nb * wr
        if vps.shape[0] < npr:
            vps = jnp.pad(vps, ((0, npr - vps.shape[0]), (0, 0)))
        vpb = vps[:npr].reshape(nb, wr, kv).transpose(0, 2, 1)  # [nb,kv,wr]
        args.append(vpb)
        in_specs.append(pl.BlockSpec((1, kv, wr),
                                     lambda i, blk: (blk[i], 0, 0),
                                     memory_space=pltpu.VMEM))
    has_extra = extra is not None
    if has_extra:
        ex = jnp.zeros((8, 128), jnp.float32)
        flat = extra.reshape(-1)[:1024]
        ex = ex.reshape(-1).at[: flat.shape[0]].set(flat).reshape(8, 128)
        args.append(ex)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = _make_vec_kernel(process, wr, h, row_e, win, k, k_pad,
                              x_splits, vp_splits, has_vp, has_extra)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, k_pad, wr), lambda i, blk: (blk[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k_pad, wr), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k_pad, wr), jnp.float32),
        interpret=interpret,
    )(*args)
    # [nb, k_pad, wr] -> [n_pad, K]
    y = out[:, :k, :].transpose(0, 2, 1).reshape(nb * wr, k)
    return y[:n_pad]


def spmv_vec(plan: SpmvPlan, x, process: Callable, vp_receiver=None,
             extra=None, k: int | None = None, x_splits: int = 2,
             vp_splits: int = 2, interpret: bool = False):
    """K-wide generalized SpMV: ``y[r,:] = Σ_{(s→r)} process(x[s], val,
    vp[r], extra)``.

    ``x``: f32[n_send_pad(+), K]; ``vp_receiver``: optional f32[n_pad, K]
    receiver operand (the SpMSpV3 third operand); ``extra``: optional
    broadcast state vector (≤1024 f32, delivered to ``process`` as an
    [8, 128] tile).  ``process(xv, ev, vpr, extra)`` maps ``[K, e]`` tiles.
    Returns f32[n_pad, K].
    """
    if k is None:
        k = int(x.shape[1])
    if x.shape[0] < plan.n_send_pad:
        x = jnp.pad(x, ((0, plan.n_send_pad - x.shape[0]), (0, 0)))
    x = x[: plan.n_send_pad].astype(jnp.float32)
    if vp_receiver is not None:
        vp_receiver = vp_receiver.astype(jnp.float32)
    if extra is not None:
        extra = extra.astype(jnp.float32)
    plan_arrays = (plan.blkid, plan.hiabs, plan.slo, plan.rrel,
                   plan.vals, plan.mask)
    plan_static = (plan.nc, plan.nb, plan.wr, plan.h, plan.n_pad,
                   plan.row_e, plan.win)
    return _spmv_vec_call(plan_arrays, plan_static, x, vp_receiver, extra,
                          process, k, x_splits, vp_splits, interpret)
