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

    # jit around shard_map is required, not a nicety: an eagerly-executed
    # shard_map dispatches every traced primitive as its own multi-device
    # program (hundreds of micro-compiles per call)
    fn = jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    ))
    return fn(features, pair_indices)


def match_all_pairs_ring(
    mesh: Mesh,
    features: Features,
    *,
    ratio: float = 0.8,
    max_matches: int = 1024,
):
    """All-pairs matching with VIEW-sharded descriptors and a ring pass.

    The replicated layout above is fine at 7 views; at collection scale
    (500+ views x 5120 x 256 descriptors) replicating every descriptor to
    every device is O(V F D) memory per chip. This is the SURVEY §2.3
    ring design — structurally the neighbor-exchange of ring attention:

      - views are block-sharded over the mesh (B = V/D views per device),
      - each of D rounds, every device matches its resident block against
        a visiting block with MXU matmuls, then forwards the visiting
        block to its ring neighbor via ppermute over ICI,
      - a (local, visiting) pair is emitted only when global_left <
        global_right, which covers every unordered pair exactly once
        across the ring (the reverse ordering appears on the partner
        device and is masked there).

    Per-device memory: 2/D of the descriptor set. Returns
    (matches (D*B*B, M), pair_gid (D*B*B,)) PER DEVICE, concatenated over
    the mesh axis; pair_gid is left_view * V + right_view, or -1 for
    masked slots. Use ``ring_matches_to_matrix`` to assemble the match
    matrix.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    V = features.num_views
    if V % n_dev:
        raise ValueError(f"pad views ({V}) to a multiple of the mesh ({n_dev})")
    B = V // n_dev
    perm = [(k, (k + 1) % n_dev) for k in range(n_dev)]

    def local(desc, valid, gid):
        # desc (B, F, Dd), valid (B, F), gid (B,)
        visit = (desc, valid, gid)
        out_idx, out_dist, out_ok, out_gid = [], [], [], []
        for _ in range(n_dev):
            d2, v2, g2 = visit

            def one(i, j):
                gi, gj = gid[i], g2[j]
                swap = gi > gj
                da = jnp.where(swap, d2[j], desc[i])
                va = jnp.where(swap, v2[j], valid[i])
                db = jnp.where(swap, desc[i], d2[j])
                vb = jnp.where(swap, valid[i], v2[j])
                m = match_pair(da, va, db, vb, ratio=ratio,
                               max_matches=max_matches)
                keep = gi < gj
                return (m.idx, m.dist, m.valid & keep,
                        jnp.where(keep, gi * V + gj, -1))

            ii = jnp.repeat(jnp.arange(B), B)
            jj = jnp.tile(jnp.arange(B), B)
            mi, md, mv, mg = jax.vmap(one)(ii, jj)
            out_idx.append(mi)
            out_dist.append(md)
            out_ok.append(mv)
            out_gid.append(mg)
            visit = jax.lax.ppermute(visit, axis, perm)
        return (jnp.concatenate(out_idx), jnp.concatenate(out_dist),
                jnp.concatenate(out_ok), jnp.concatenate(out_gid))

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    ))
    gids = jnp.arange(V, dtype=jnp.int32)
    idx, dist, ok, gid = fn(features.desc, features.valid, gids)
    return Matches(idx=idx, dist=dist, valid=ok), gid


def ring_matches_to_matrix(matches: Matches, pair_gid: jnp.ndarray, V: int):
    """Reassemble ring output into the canonical (P, M) match matrix
    ordered like [(i, j) for i in range(V) for j in range(i+1, V)]."""
    import numpy as np

    pairs = [(i, j) for i in range(V) for j in range(i + 1, V)]
    row_of = {i * V + j: n for n, (i, j) in enumerate(pairs)}
    gid = np.asarray(pair_gid)
    M = matches.idx.shape[1]
    out_idx = np.full((len(pairs), M, 2), -1, np.int32)
    out_dist = np.full((len(pairs), M), 1e9, np.float32)
    out_valid = np.zeros((len(pairs), M), bool)
    for slot, g in enumerate(gid):
        if g < 0 or int(g) not in row_of:
            continue
        r = row_of[int(g)]
        out_idx[r] = np.asarray(matches.idx[slot])
        out_dist[r] = np.asarray(matches.dist[slot])
        out_valid[r] = np.asarray(matches.valid[slot])
    return out_idx, out_dist, out_valid
