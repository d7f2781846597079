"""Brute-force descriptor matching as MXU matmuls.

TPU-native re-design of the reference matchers:
- modern: BFMatcher(Hamming) kNN(k=2) + Lowe ratio 0.8
  (SfMToyLib/SfM2DFeatureUtilities.cpp:53-71)
- legacy: BFMatcher cross-check + trainIdx dedup
  (legacy/SfMToyLib_Old/RichFeatureMatcher.cpp:81-138)

Descriptors are +-1 vectors (features/detect.py), so the full (F1, F2)
Hamming distance matrix is hamming = (D - A @ B^T) / 2 — one bf16 matmul
that XLA tiles straight onto the MXU. The reference's O(F^2 D) scalar
Hamming loop (per-pair, per-thread, SfM.cpp:186-206) becomes a single
dense contraction; all P pairs batch with vmap and shard over the device
mesh (see dist/).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusfm.types import Features, Matches

_BIG = 1e9


def hamming_distance_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """(F1, D) x (F2, D) +-1 descriptors -> (F1, F2) Hamming distances.

    Contraction runs in bf16 on the MXU with f32 accumulation; exact for
    +-1 inputs (D <= 512 sums of +-1 are exactly representable).
    """
    dots = jax.lax.dot_general(
        desc1.astype(jnp.bfloat16),
        desc2.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = desc1.shape[-1]
    return 0.5 * (d - dots)


def l2_distance_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """(F1, D) x (F2, D) float descriptors -> (F1, F2) Euclidean distances.

    The MXU form of the legacy ``BruteForceMatcher_GPU<L2>``
    (GPUSURFFeatureMatcher.cpp:100-124): |a-b|^2 = |a|^2 + |b|^2 - 2 a.b,
    one f32 contraction plus rank-1 corrections.
    """
    dots = jax.lax.dot_general(
        desc1, desc2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    n1 = jnp.sum(desc1 * desc1, axis=1)[:, None]
    n2 = jnp.sum(desc2 * desc2, axis=1)[None, :]
    return jnp.sqrt(jnp.maximum(n1 + n2 - 2.0 * dots, 0.0))


def match_pair(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    *,
    ratio: float = 0.8,
    cross_check: bool = False,
    max_matches: int = 1024,
    metric: str = "hamming",
) -> Matches:
    """Match one view pair -> fixed-capacity Matches.

    kNN(k=2) + Lowe ratio test (best < ratio * second-best), the exact
    acceptance rule of the reference (SfM2DFeatureUtilities.cpp:60-68);
    optional mutual-nearest cross-check (legacy RichFeatureMatcher.cpp:81).
    metric="l2" selects float-descriptor matching (legacy GPU-SURF path).
    The best ``max_matches`` accepted matches (by ascending distance) fill
    the static capacity; the rest are masked out.
    """
    dmat = l2_distance_matrix if metric == "l2" else hamming_distance_matrix
    dist = dmat(desc1, desc2)
    dist = jnp.where(valid1[:, None] & valid2[None, :], dist, _BIG)

    # two smallest distances per left feature
    neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)  # (F1, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    best_idx = idx_top2[:, 0]

    ok = (best < ratio * second) & (best < _BIG) & valid1
    if cross_check:
        rbest = jnp.argmin(dist, axis=0)  # (F2,) best left for each right
        mutual = rbest[best_idx] == jnp.arange(desc1.shape[0])
        ok = ok & mutual

    score = jnp.where(ok, -best, -jnp.inf)
    sel_score, sel = jax.lax.top_k(score, max_matches)  # best first
    sel_ok = jnp.isfinite(sel_score)
    left = jnp.where(sel_ok, sel, -1).astype(jnp.int32)
    right = jnp.where(sel_ok, best_idx[sel], -1).astype(jnp.int32)
    return Matches(
        idx=jnp.stack([left, right], axis=1),
        dist=jnp.where(sel_ok, -sel_score, _BIG).astype(jnp.float32),
        valid=sel_ok,
    )


def match_all_pairs(
    features: Features,
    pair_indices: jnp.ndarray,
    *,
    ratio: float = 0.8,
    cross_check: bool = False,
    max_matches: int = 1024,
    metric: str = "hamming",
) -> Matches:
    """Match every (i, j) pair in one batched call -> Matches (P, M, ...).

    Replaces the reference's std::thread fan-out over pairs
    (SfM.cpp:165-211): pairs become a vmapped batch dimension; the match
    matrix is the stacked result. ``pair_indices`` is (P, 2) int32.
    """

    def one(pair):
        i, j = pair[0], pair[1]
        return match_pair(
            features.desc[i],
            features.valid[i],
            features.desc[j],
            features.valid[j],
            ratio=ratio,
            cross_check=cross_check,
            max_matches=max_matches,
            metric=metric,
        )

    return jax.vmap(one)(pair_indices)


def matched_coordinates(features: Features, pair: jnp.ndarray, matches: Matches):
    """Gather aligned (uv1, uv2, mask) pixel coords for one matched pair.

    Equivalent of GetAlignedPointsFromMatch (SfMCommon.cpp:63-87) on padded
    arrays: invalid slots gather index 0 but stay masked.
    """
    i, j = pair[0], pair[1]
    li = jnp.maximum(matches.idx[:, 0], 0)
    ri = jnp.maximum(matches.idx[:, 1], 0)
    uv1 = features.xy[i][li]
    uv2 = features.xy[j][ri]
    return uv1, uv2, matches.valid
