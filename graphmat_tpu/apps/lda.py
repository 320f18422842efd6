"""Collapsed variational LDA on a doc-term bipartite graph
(reference: ``src/LDA.cpp``).

Vertices 1..ndoc are documents, ndoc+1..ndoc+nterms are terms; edges carry
token counts and exist in both directions (ALL_EDGES + ALL_VERTICES).
Vertex property ``N[K]`` holds per-topic expected counts; the global topic
totals ``global_N[K]`` (a cross-shard reduce over term vertices) live in
program state and are recomputed in ``do_every_iteration``
(:144-147,190-192) — on the mesh this folds a psum into the compiled step.

* **LDAInitProgram** (:70-112): per-edge gamma seeded by ``rand_r(edge
  value)`` so both directions of an edge agree (bit-exact glibc LCG replica,
  ``utils.reference_rng``); ``res = gamma/Σgamma · count``; apply overwrites N.
* **LDAProgram** (:128-194): gamma ∝ ``(N_recv + off_r − 1)(N_send + off_s −
  1) / (global_N + V(eta−1))`` with (α, η) offsets chosen by the receiver's
  side; α=1, η=5 (:292-293).
* **LDALLProgram** (:196-250): per-vertex token log-likelihood given
  smoothed topic-word distributions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph
from ..core.program import (GraphProgram, PallasVec2Semiring,
                            PallasVecSemiring)
from ..core.runtime import engine_for
from ..core.types import Activity, Direction, SUM
from ..utils.reference_rng import rand_r_jnp


def _make_lda_init_process(k, dtype):
    # per-edge gamma from the glibc LCG, rank-2 ops only and all-int32
    # (Mosaic supports neither f32->u32 casts nor uint arithmetic well);
    # int32 wraparound is bit-identical to uint32, and logical shifts +
    # bit masks replace the unsigned >> and %.
    import jax.lax as lax
    a = np.int32(1103515245)
    c = np.int32(12345)
    randmax = 2 ** 31 - 1

    def proc(xv, ev, vpr, extra, rid):
        nxt = ev.astype(jnp.int32)             # [1, e] (counts are small)
        rows = []
        for _ in range(k):
            nxt = nxt * a + c
            r = lax.shift_right_logical(nxt, 16) & 2047
            nxt = nxt * a + c
            r = (r << 10) ^ (lax.shift_right_logical(nxt, 16) & 1023)
            nxt = nxt * a + c
            r = (r << 10) ^ (lax.shift_right_logical(nxt, 16) & 1023)
            rows.append((r / randmax).astype(dtype))
        gamma = jnp.concatenate(rows, axis=0)  # [k, e]
        gamma = gamma / jnp.sum(gamma, axis=0, keepdims=True)
        return gamma * ev

    return proc


def _make_lda_init_process_v2(k, dtype):
    """vec2 layout: lane j of each 32-lane block carries topic j."""
    import jax
    import jax.lax as lax
    a = np.int32(1103515245)
    c = np.int32(12345)
    randmax = 2 ** 31 - 1

    def proc(xv, ev, vpr, extra, rid, block_sum):
        multi = isinstance(xv, (list, tuple))
        xv_l = xv if multi else [xv]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, xv_l[0].shape,
                                          1) % 32
        # the LCG advances in GLOBAL topic order across planes so any-K
        # stays bit-identical with the reference's per-edge rand_r walk
        nxt = ev.astype(jnp.int32)
        gammas = []
        for p, _xp in enumerate(xv_l):
            gamma = jnp.zeros(xv_l[0].shape, dtype)
            for j in range(32 * p, min(k, 32 * p + 32)):
                nxt = nxt * a + c
                r = lax.shift_right_logical(nxt, 16) & 2047
                nxt = nxt * a + c
                r = (r << 10) ^ (lax.shift_right_logical(nxt, 16) & 1023)
                nxt = nxt * a + c
                r = (r << 10) ^ (lax.shift_right_logical(nxt, 16) & 1023)
                gamma = jnp.where(lane_k == j - 32 * p,
                                  (r / randmax).astype(dtype), gamma)
            gammas.append(gamma)
        tot = sum(block_sum(g) for g in gammas)
        outs = [g / tot * ev for g in gammas]
        return outs if multi else outs[0]

    return proc


def _make_lda_process_v2(k, alpha, eta, vocab_size, dtype):
    """The doc/term discrimination rides an ENCODED is_doc flag at lane
    ``k`` of the receiver's vp block (``encode_vp`` appends it) — the
    receiver id is in internal (possibly degree-permuted) space, so a
    ``rid < ndoc`` test would silently mislabel permuted vertices."""
    import jax

    def proc(xv, ev, vpr, extra, rid, block_sum):
        multi = isinstance(xv, (list, tuple))
        xv_l = xv if multi else [xv]
        vpr_l = vpr if multi else [vpr]
        ex_l = extra if multi else [extra]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, xv_l[0].shape,
                                          1) % 32
        # is_doc flag lives at GLOBAL lane k -> plane k//32, lane k%32
        flag = block_sum(jnp.where(lane_k == k % 32,
                                   vpr_l[k // 32], 0.0))
        is_doc = flag > 0.5
        my_off = jnp.where(is_doc, alpha, eta).astype(dtype)
        other_off = jnp.where(is_doc, eta, alpha).astype(dtype)
        gammas = []
        for p, (xp, vp_, gn) in enumerate(zip(xv_l, vpr_l, ex_l)):
            denom = gn + vocab_size * (eta - 1.0)
            g = (vp_ + my_off - 1.0) * (xp + other_off - 1.0) / denom
            gammas.append(jnp.where(32 * p + lane_k < k, g, 0.0))
        tot = sum(block_sum(g) for g in gammas)
        outs = [g / tot * ev for g in gammas]
        return outs if multi else outs[0]

    return proc


def _make_lda_ll_process_v2(k, eta, n_k_smoothed, dtype):
    import jax

    def proc(xv, ev, vpr, extra, rid, block_sum):
        multi = isinstance(xv, (list, tuple))
        xv_l = xv if multi else [xv]
        vpr_l = vpr if multi else [vpr]
        ex_l = extra if multi else [extra]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, xv_l[0].shape,
                                          1) % 32
        phis, thetas = [], []
        for p, (xp, vp_, nks) in enumerate(zip(xv_l, vpr_l, ex_l)):
            valid = 32 * p + lane_k < k
            phis.append(jnp.where(valid, (vp_ + (eta - 1.0)) / nks, 0.0))
            thetas.append(jnp.where(valid, xp + (eta - 1.0), 0.0))
        th_tot = sum(block_sum(t) for t in thetas)
        dot = sum(block_sum(ph * th / th_tot)
                  for ph, th in zip(phis, thetas))
        out0 = jnp.where(lane_k == 0, ev * jnp.log(dot), 0.0)
        if not multi:
            return out0
        return [out0] + [jnp.zeros_like(out0)] * (len(xv_l) - 1)

    return proc


def _make_lda_process(k, alpha, eta, vocab_size, dtype):
    """vec (K-row-tile) variant: operands carry k+1 rows, row ``k`` of
    ``vpr`` is the encoded is_doc flag (permutation-safe; see the v2
    variant's docstring)."""
    def proc(xv, ev, vpr, extra, rid):
        gn = extra[0:1, 0:k].reshape(k, 1)
        is_doc = vpr[k: k + 1, :] > 0.5        # [1, e]
        my_off = jnp.where(is_doc, alpha, eta)
        other_off = jnp.where(is_doc, eta, alpha)
        denom = gn + vocab_size * (eta - 1.0)
        gamma = ((vpr[:k] + my_off - 1.0) * (xv[:k] + other_off - 1.0)
                 / denom)
        gamma = gamma / jnp.sum(gamma, axis=0, keepdims=True)
        out = gamma * ev
        return jnp.concatenate(
            [out, jnp.zeros_like(out[0: 1])], axis=0)   # k+1 rows out

    return proc

__all__ = ["LDAInitProgram", "LDAProgram", "LDALLProgram", "run_lda"]


class LDAInitProgram(GraphProgram):
    order = Direction.ALL_EDGES
    activity = Activity.ALL_VERTICES
    reduce = SUM
    process_requires_vertexprop = False

    def __init__(self, k: int = 20, dtype=jnp.float32):
        self.k = k
        self.dtype = dtype
        self._vec_proc = _make_lda_init_process(k, dtype)
        self._vec2_proc = _make_lda_init_process_v2(k, dtype)

    def pallas_vec_semiring(self):
        return PallasVecSemiring(
            k=self.k,
            process=self._vec_proc,
            encode=lambda state, msg: msg,
            decode=lambda y: y.astype(self.dtype))

    def pallas_vec2_semiring(self):
        return PallasVec2Semiring(
            k=self.k,
            process=self._vec2_proc,
            encode=lambda state, msg: msg,
            decode=lambda y: y.astype(self.dtype))

    def send_message(self, state, vp):
        return vp["N"], None

    def process_message(self, state, msg, edge_vals, vp_r):
        gamma = rand_r_jnp(edge_vals.astype(jnp.uint32), self.k,
                           dtype=self.dtype)
        gamma = gamma / jnp.sum(gamma, axis=1, keepdims=True)
        return gamma * edge_vals.astype(self.dtype)[:, None]

    def apply(self, state, reduced, vp):
        out = dict(vp)
        out["N"] = reduced
        return out


def _global_topic_totals(vp, ctx, dtype):
    """Σ over term ('w') vertices of N — ``calcGlobalN`` (:140-143)."""
    is_term = ~vp["is_doc"]
    local = jnp.sum(jnp.where(is_term[:, None], vp["N"],
                              jnp.array(0, dtype)), axis=0)
    return ctx.all_reduce_sum(local)


class LDAProgram(GraphProgram):
    order = Direction.ALL_EDGES
    activity = Activity.ALL_VERTICES
    reduce = SUM
    process_requires_vertexprop = True

    def __init__(self, k: int = 20, alpha: float = 1.0, eta: float = 5.0,
                 vocab_size: int = 0, ndoc: int = 0, dtype=jnp.float32):
        self.k = k
        self.alpha = alpha
        self.eta = eta
        self.vocab_size = vocab_size
        self.ndoc = ndoc
        self.dtype = dtype
        self._vec_proc = _make_lda_process(k, alpha, eta, vocab_size,
                                           dtype)
        self._vec2_proc = _make_lda_process_v2(k, alpha, eta, vocab_size,
                                               dtype)

    # The kernel operands carry k+1 columns: column k of the encoded vp
    # is the is_doc flag, so the doc/term split survives any vertex
    # permutation (the reference discriminates by id threshold,
    # src/LDA.cpp:84-147, but its ids are never relabeled; ours can be).
    def _encode_msg(self, state, msg):
        return jnp.pad(msg["N"], ((0, 0), (0, 1)))

    def _encode_vp(self, state, vp):
        return jnp.concatenate(
            [vp["N"], vp["is_doc"].astype(vp["N"].dtype)[:, None]],
            axis=1)

    def pallas_vec_semiring(self):
        if self.ndoc <= 0:
            return None  # doc/term split unknown (direct engine use)
        return PallasVecSemiring(
            k=self.k + 1,
            process=self._vec_proc,
            encode=self._encode_msg,
            encode_vp=self._encode_vp,
            decode=lambda y: y[:, : self.k].astype(self.dtype),
            needs_vp=True,
            extra_fn=lambda state: state.reshape(1, -1))

    def pallas_vec2_semiring(self):
        if self.ndoc <= 0:
            return None  # doc/term split unknown (direct engine use)
        return PallasVec2Semiring(
            k=self.k + 1,
            process=self._vec2_proc,
            encode=self._encode_msg,
            encode_vp=self._encode_vp,
            decode=lambda y: y[:, : self.k].astype(self.dtype),
            needs_vp=True,
            extra_fn=lambda state: state.reshape(1, -1))

    def init_state(self, graph):
        # global_N; caller should refresh via calc_global_n before running
        return jnp.zeros((self.k,), self.dtype)

    def send_message(self, state, vp):
        return {"N": vp["N"]}, None

    def process_message(self, state, msg, edge_vals, vp_r):
        global_n = state
        my_off = jnp.where(vp_r["is_doc"], jnp.array(self.alpha, self.dtype),
                           jnp.array(self.eta, self.dtype))[:, None]
        other_off = jnp.where(vp_r["is_doc"], jnp.array(self.eta, self.dtype),
                              jnp.array(self.alpha, self.dtype))[:, None]
        denom = global_n + self.vocab_size * (self.eta - 1.0)
        gamma = ((vp_r["N"] + my_off - 1.0) * (msg["N"] + other_off - 1.0)
                 / denom[None, :])
        gamma = gamma / jnp.sum(gamma, axis=1, keepdims=True)
        return gamma * edge_vals.astype(self.dtype)[:, None]

    def apply(self, state, reduced, vp):
        out = dict(vp)
        out["N"] = reduced
        return out

    def changed(self, old_vp, new_vp):
        # operator!= tolerance 1e-3 on N (:52-58)
        return jnp.any(jnp.abs(old_vp["N"] - new_vp["N"]) > 1e-3, axis=1)

    def do_every_iteration(self, state, vp, it, ctx):
        return _global_topic_totals(vp, ctx, self.dtype)


class LDALLProgram(GraphProgram):
    order = Direction.OUT_EDGES
    activity = Activity.ALL_VERTICES
    reduce = SUM
    process_requires_vertexprop = True

    def __init__(self, n_k, eta: float, nterms: int, k: int = 20,
                 dtype=jnp.float32):
        self.k = k
        self.eta = eta
        # smoothed N_k (:176-181)
        self.n_k_smoothed = jnp.asarray(np.asarray(n_k)
                                        + nterms * (eta - 1.0), dtype)
        self.dtype = dtype

    def pallas_vec2_semiring(self):
        nks = self.n_k_smoothed
        return PallasVec2Semiring(
            k=self.k,
            process=_make_lda_ll_process_v2(self.k, self.eta, nks,
                                            self.dtype),
            encode=lambda state, msg: msg["N"],
            encode_vp=lambda state, vp: vp["N"],
            decode=lambda y: y[:, 0].astype(self.dtype),
            needs_vp=True,
            extra_fn=lambda state: nks.reshape(1, -1))

    def send_message(self, state, vp):
        return {"N": vp["N"]}, None

    def process_message(self, state, msg, edge_vals, vp_r):
        phi = (vp_r["N"] + (self.eta - 1.0)) / self.n_k_smoothed[None, :]
        theta = msg["N"] + (self.eta - 1.0)
        theta = theta / jnp.sum(theta, axis=1, keepdims=True)
        dot = jnp.sum(phi * theta, axis=1)
        return edge_vals.astype(self.dtype) * jnp.log(dot)

    def apply(self, state, reduced, vp):
        out = dict(vp)
        out["token_loglik"] = reduced
        return out


def run_lda(graph: Graph, ndoc: int, nterms: int, k: int = 20,
            iterations: int = 10, alpha: float = 1.0, eta: float = 5.0,
            dtype=jnp.float32):
    """Full reference flow (:263-345).

    Returns ``(N[n,k], global_N[k], total_loglik)``.
    """
    if ndoc + nterms != graph.n:
        raise ValueError("ndoc + nterms must equal the vertex count "
                         "(src/LDA.cpp:268-271)")
    is_doc = np.zeros(graph.n, bool)
    is_doc[:ndoc] = True
    graph.init_vertexproperty(
        N=np.zeros((graph.n, k), np.dtype(dtype)),
        is_doc=is_doc,
        token_loglik=np.array(0, np.dtype(dtype)),
    )

    engine_for(LDAInitProgram(k, dtype=dtype), graph).run(iterations=1)

    prog = LDAProgram(k, alpha, eta, vocab_size=nterms, ndoc=ndoc,
                      dtype=dtype)
    eng = engine_for(prog, graph)
    # ldap.calcGlobalN() before the run (:279) — computed on host from
    # the exported (unpermuted, unsharded) properties: ctx collectives
    # are only legal inside the traced step, and this one-time reduce is
    # not on the hot path
    vpn = graph.vp_numpy()
    global_n = jnp.asarray(
        vpn["N"][~vpn["is_doc"].astype(bool)].sum(axis=0), dtype)
    eng.run(iterations=iterations, state=global_n)
    global_n = jnp.asarray(eng.final_state)

    ll_prog = LDALLProgram(global_n, eta, nterms, k, dtype=dtype)
    engine_for(ll_prog, graph).run(iterations=1)
    vp = graph.vp_numpy()
    total_ll = float(vp["token_loglik"].sum())
    return vp["N"], np.asarray(global_n), total_ll


def _main(argv=None):
    """CLI parity with ``src/LDA.cpp``: <A.mtx> <NDOC> <NTERMS> [iters]."""
    import sys
    import time
    from ._cli import build_graph, load_graph_file
    args = (argv if argv is not None else sys.argv[1:])
    if len(args) < 3:
        print("Correct format: lda A.mtx #DOC #TERMS {#iterations (default 10)}")
        return 0
    from ..core.graph import Graph
    g = build_graph(load_graph_file(args[0]))
    iters = int(args[3]) if len(args) > 3 else 10
    t0 = time.time()
    N, gN, ll = run_lda(g, int(args[1]), int(args[2]), iterations=iters)
    print(f"Time = {(time.time() - t0) * 1e3:.3f} ms")
    print(f"Total Loglikelihood = {ll:.6f}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(_main())
