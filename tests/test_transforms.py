"""Edge-list transformation tests — mirrors ``test/test_edgelist_utils.cpp``.
"""

import numpy as np

from graphmat_tpu.io import transforms as tf
from graphmat_tpu.io.edgelist import edgelist_from_arrays
from graphmat_tpu.utils.generators import random_edgelist


def make(src, dst, val=None, n=10):
    return edgelist_from_arrays(src, dst, val, m=n, n=n)


def test_remove_selfedges():
    e = make([1, 2, 3, 4], [1, 3, 3, 5])
    r = tf.remove_selfedges(e)
    assert r.as_records() == {(2, 3, 1), (4, 5, 1)}


def test_remove_duplicates_keeps_first():
    e = make([2, 1, 2, 1], [3, 2, 3, 2], [10, 20, 30, 40])
    r = tf.remove_duplicate_edges(e)
    # stable sort by (src,dst): first occurrence in file order wins
    assert r.as_records() == {(1, 2, 20), (2, 3, 10)}


def test_bidirectional():
    e = make([1, 2], [2, 3], [5, 6])
    r = tf.create_bidirectional_edges(e)
    assert r.as_records() == {(1, 2, 5), (2, 1, 5), (2, 3, 6), (3, 2, 6)}


def test_convert_to_dag():
    e = make([3, 1, 5], [2, 4, 5], [1, 2, 3])
    r = tf.convert_to_dag(e)
    assert (r.src <= r.dst).all()
    assert r.as_records() == {(2, 3, 1), (1, 4, 2), (5, 5, 3)}


def test_upper_triangular():
    e = make([3, 1, 5, 2, 3], [2, 4, 5, 3, 2], [1, 2, 3, 4, 5])
    r = tf.convert_to_upper_triangular(e)
    assert (r.src < r.dst).all()
    pairs = set(zip(r.src.tolist(), r.dst.tolist()))
    assert pairs == {(2, 3), (1, 4)}
    assert len(pairs) == r.nnz


def test_filter_edges():
    e = make([1, 2, 3], [2, 3, 4], [1, 5, 9])
    light = tf.filter_edges(e, lambda s, d, v: v <= 5)
    heavy = tf.filter_edges(e, lambda s, d, v: v > 5)
    assert light.nnz == 2 and heavy.nnz == 1
    assert light.as_records() | heavy.as_records() == e.as_records()


def test_random_edge_weights_range():
    e = random_edgelist(100, 5, seed=1)
    r = tf.random_edge_weights(e, 64, seed=2)
    assert r.val.min() >= 1 and r.val.max() <= 64
    assert r.nnz == e.nnz


def test_randomize_vertex_ids_preserves_structure():
    e = random_edgelist(50, 4, seed=7)
    r, perm = tf.randomize_vertex_ids(e, seed=9)
    assert sorted(perm.tolist()) == list(range(1, 51))
    # inverse-permute back and compare
    inv = np.empty(50, np.int32)
    inv[perm - 1] = np.arange(1, 51)
    back = edgelist_from_arrays(inv[r.src - 1], inv[r.dst - 1], r.val,
                                m=50, n=50)
    assert back.as_records() == e.as_records()


def test_randomize_direction_preserves_pairs():
    e = random_edgelist(30, 4, seed=11)
    r = tf.randomize_edge_direction(e, seed=13)
    a = {frozenset((s, d)) for s, d in zip(e.src, e.dst)}
    b = {frozenset((s, d)) for s, d in zip(r.src, r.dst)}
    assert a == b
