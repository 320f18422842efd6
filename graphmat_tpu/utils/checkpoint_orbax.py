"""Device-sharded checkpoint via orbax (large-graph path).

The npz checkpoint (:mod:`graphmat_tpu.utils.checkpoint`) gathers vertex
state to host — fine for single-host graphs, quadratic pain at pod
scale.  This module saves the sharded arrays directly from device memory
(every host writes only its shards, in parallel) and restores them onto
any mesh: orbax re-shards on load given the target shardings.

Compare the reference's ``WriteGraphMatBin`` per-rank Boost archives
(``Graph.h:152-208``), which refuse to load under a different rank or
thread count — here the mesh shape is a property of the RESTORE, not the
checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

__all__ = ["save_sharded_state", "load_sharded_state"]


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def _state_of(graph) -> dict:
    return {"vp": dict(graph.vp), "active": graph.active}


def save_sharded_state(graph, path: str) -> None:
    """Save vp pytree + active mask from device, shard-parallel."""
    ckptr = _ckptr()
    ckptr.save(os.path.abspath(path), _state_of(graph), force=True)
    ckptr.wait_until_finished()


def load_sharded_state(graph, path: str) -> None:
    """Restore onto ``graph`` (any mesh): arrays are re-sharded to the
    graph's current shardings on read."""
    ckptr = _ckptr()
    template = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)
        if hasattr(a, "sharding") else a,
        _state_of(graph))
    restored = ckptr.restore(os.path.abspath(path), template)
    graph.vp = restored["vp"]
    graph.active = restored["active"]
