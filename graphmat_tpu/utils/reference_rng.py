"""Bit-exact replica of glibc's ``rand_r`` (TYPE_0 LCG).

The reference seeds deterministic per-vertex / per-edge randomness with
``rand_r`` (SGD init ``src/SGD.cpp:176-184``, LDA's per-edge gamma
``src/LDA.cpp:92-97``).  Replicating it exactly lets our SGD/LDA start from
the *same* initial factors as the reference binaries, so results agree to
floating-point tolerance rather than merely in distribution.

glibc rand_r (stdlib/rand_r.c): three LCG steps
``next = next*1103515245 + 12345`` producing 11+10+10 bits:

    result = ((next1/65536) % 2048) << 20
           ^ ((next2/65536) % 1024) << 10
           ^ ((next3/65536) % 1024)

RAND_MAX = 2**31 - 1.
"""

from __future__ import annotations

import numpy as np

try:  # jnp version is importable lazily to keep numpy-only callers light
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

__all__ = ["RAND_MAX", "rand_r_np", "rand_r_uniform_np", "rand_r_jnp"]

RAND_MAX = 2 ** 31 - 1
_A = np.uint32(1103515245)
_C = np.uint32(12345)


def rand_r_np(seeds, count: int) -> np.ndarray:
    """Vectorized rand_r: for each seed draw ``count`` values.

    Returns int64 array of shape ``(len(seeds), count)`` in [0, RAND_MAX].
    """
    next_ = np.asarray(seeds, np.uint32).copy()
    out = np.empty((next_.shape[0], count), np.int64)
    with np.errstate(over="ignore"):
        for k in range(count):
            next_ = next_ * _A + _C
            r = ((next_ >> np.uint32(16)) % np.uint32(2048)).astype(np.int64)
            next_ = next_ * _A + _C
            r = (r << 10) ^ ((next_ >> np.uint32(16)) % np.uint32(1024)).astype(np.int64)
            next_ = next_ * _A + _C
            r = (r << 10) ^ ((next_ >> np.uint32(16)) % np.uint32(1024)).astype(np.int64)
            out[:, k] = r
    return out


def rand_r_uniform_np(seeds, count: int, dtype=np.float64) -> np.ndarray:
    """``(double)rand_r(&s) / RAND_MAX`` — the reference's uniform draw."""
    return (rand_r_np(seeds, count) / RAND_MAX).astype(dtype)


def rand_r_jnp(seeds, count: int, dtype=None):
    """JAX version (traceable): same bit pattern, uniform in [0, 1].

    ``seeds``: uint32/int32 array [...]; returns [..., count] floats.
    """
    if dtype is None:
        dtype = jnp.float32
    a = jnp.uint32(1103515245)
    c = jnp.uint32(12345)
    next_ = seeds.astype(jnp.uint32)
    outs = []
    for _ in range(count):
        next_ = next_ * a + c
        r = ((next_ >> 16) % 2048).astype(jnp.int32)
        next_ = next_ * a + c
        r = (r << 10) ^ ((next_ >> 16) % 1024).astype(jnp.int32)
        next_ = next_ * a + c
        r = (r << 10) ^ ((next_ >> 16) % 1024).astype(jnp.int32)
        outs.append(r)
    vals = jnp.stack(outs, axis=-1)
    return (vals / RAND_MAX).astype(dtype)


def glibc_rand_np(seed: int, n: int) -> np.ndarray:
    """Bit-exact glibc ``srand(seed)``/``rand()`` sequence (TYPE_3
    additive-feedback generator, glibc stdlib/random_r.c): 31-word state
    seeded by a Park-Miller LCG (Schrage's method), 310 warm-up outputs
    discarded, then ``out = (r[f] += r[p]) >> 1`` over the ring.

    The reference's ``randomize_edgelist_square`` consumes exactly this
    sequence (``edgelist.h:337-366``: ``srand(5)`` + ``rand() % m``), so
    replicating it makes vertex-id randomization byte-identical to the
    reference binaries.  Sequential by construction (the additive ring
    has a lag-3 dependency); the native planner carries the fast C
    version (``gm_glibc_square_mapping``).
    """
    r = np.zeros(31, np.uint32)
    word = np.int64(seed if seed != 0 else 1)
    r[0] = np.uint32(word)
    for i in range(1, 31):
        hi, lo = word // 127773, word % 127773
        word = 16807 * lo - 2836 * hi
        if word < 0:
            word += 2147483647
        r[i] = np.uint32(word)
    rl = r.tolist()   # python ints: fast wrap-free loop, mask to 32 bits
    f, p = 3, 0
    for _ in range(310):
        rl[f] = (rl[f] + rl[p]) & 0xFFFFFFFF
        f = (f + 1) % 31
        p = (p + 1) % 31
    out = np.empty(n, np.int64)
    for i in range(n):
        v = (rl[f] + rl[p]) & 0xFFFFFFFF
        rl[f] = v
        out[i] = v >> 1
        f = (f + 1) % 31
        p = (p + 1) % 31
    return out


def glibc_square_mapping_np(m: int, seed: int = 5) -> np.ndarray:
    """The reference's seeded id permutation (``edgelist.h:337-366``):
    ``rval[i] = rand() % m`` then sequential swap
    ``mapping[i] <-> mapping[rval[i]]``.  Returns mapping[m] (0-based:
    old id i maps to mapping[i])."""
    rval = (glibc_rand_np(seed, m) % m).astype(np.int64)
    mapping = np.arange(m, dtype=np.int64)
    ml = mapping.tolist()
    rl = rval.tolist()
    for i in range(m):
        j = rl[i]
        ml[i], ml[j] = ml[j], ml[i]
    return np.asarray(ml, np.int64)
