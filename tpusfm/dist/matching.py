"""Pair-parallel feature matching over the device mesh.

TPU-native replacement for the reference's std::thread fan-out over image
pairs (SfM::createFeatureMatchMatrix, SfM.cpp:165-211: static block
partition of pairs over hardware_concurrency-1 workers). Here the pair
axis is sharded over the mesh with shard_map: every device matches its
block of pairs with one MXU matmul per pair (features replicated — they
are small; the O(P * F^2) distance computation is what scales).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm.features.match import match_pair
from tpusfm.types import Features, Matches


def match_all_pairs_sharded(
    mesh: Mesh,
    features: Features,
    pair_indices: jnp.ndarray,
    *,
    ratio: float = 0.8,
    cross_check: bool = False,
    max_matches: int = 1024,
) -> Matches:
    """Match (P, 2) pairs sharded across the mesh axis.

    P must be a multiple of the mesh size (pad with (0, 1) duplicates and
    drop the tail — the caller controls padding so results stay aligned
    with its pair list).
    """
    axis = mesh.axis_names[0]

    def local(feats: Features, pairs: jnp.ndarray) -> Matches:
        def one(pair):
            i, j = pair[0], pair[1]
            return match_pair(
                feats.desc[i], feats.valid[i], feats.desc[j], feats.valid[j],
                ratio=ratio, cross_check=cross_check, max_matches=max_matches,
            )

        return jax.vmap(one)(pairs)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    )
    return fn(features, pair_indices)
