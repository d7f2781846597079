"""Generic batched-hypothesis RANSAC.

TPU-native replacement for every iterative cv::*RANSAC call in the
reference (cv::findHomography @ SfMStereoUtilities.cpp:63,
cv::findEssentialMat @ :97, cv::solvePnPRansac @ :216-228, and legacy
GetFundamentalMat @ FindCameraMatrices.cpp:144-246): instead of a
sequential hypothesize-and-verify loop, sample B minimal sets at once,
solve all B models with one vmap, score all N points against all B models
with one (B, N) residual evaluation, and argmax the masked inlier counts.
Followed by a weighted least-squares refit on the winning inlier set
(mirrors OpenCV's final refinement).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _sample_indices(key, mask: jnp.ndarray, hypotheses: int, k: int) -> jnp.ndarray:
    """(B, k) indices sampled without replacement from valid entries.

    Gumbel-top-k over masked logits: invalid entries get -inf so they are
    never picked (as long as >= k valid entries exist).
    """
    n = mask.shape[0]
    g = jax.random.gumbel(key, (hypotheses, n))
    logits = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(logits, k)
    return idx


def ransac(
    key,
    data: Tuple[jnp.ndarray, ...],
    mask: jnp.ndarray,
    *,
    solver: Callable,       # (*minimal_data) -> (model, ok)
    scorer: Callable,       # (model, *data) -> residuals (N,)
    sample_size: int,
    hypotheses: int,
    threshold: float,
    refit: Callable | None = None,  # (model, inlier_w, *data) -> model
    lo_multipliers: Tuple[float, ...] = (4.0, 2.0, 1.0),
    lo_candidates: int = 1,
):
    """Batched-hypothesis RANSAC.

    data: tuple of (N, ...) arrays (e.g. (x1, x2) correspondences).
    mask: (N,) bool validity of each datum (padded inputs).
    Returns (model, inlier_mask (N,), inlier_count).
    """
    idx = _sample_indices(key, mask, hypotheses, sample_size)  # (B, k)
    minimal = tuple(d[idx] for d in data)  # each (B, k, ...)
    models, ok = jax.vmap(solver)(*minimal)  # pytree (B, ...), (B,)

    # MSAC (truncated-quadratic) model scoring, not binary inlier counts:
    # when the threshold is lax relative to the data noise (the reference's
    # 1 px gate vs ~0.2 px matches), several wrong models can capture
    # nearly the same inlier COUNT; scoring residual quality inside the
    # gate discriminates them the way OpenCV's USAC/MAGSAC scoring does.
    thr2 = threshold * threshold

    def msac(resid):
        r = jnp.where(jnp.isfinite(resid), resid, jnp.inf)
        return jnp.sum(jnp.where(mask, jnp.maximum(thr2 - jnp.square(r), 0.0), 0.0))

    resid = jax.vmap(lambda m: scorer(m, *data))(models)  # (B, N)
    resid = jnp.where(jnp.isfinite(resid), resid, jnp.inf)
    inl = (resid < threshold) & mask[None, :]  # (B, N)
    scores = jax.vmap(msac)(resid)
    scores = jnp.where(ok, scores, -1.0)
    best = jnp.argmax(scores)

    if refit is None:
        model = jax.tree.map(lambda m: m[best], models)
        inlier_mask = inl[best]
        return model, inlier_mask, jnp.sum(inlier_mask)

    # Locally-optimized refinement (LO-RANSAC, Chum et al.): minimal
    # models amplify noise, so their consensus sets are biased. Refit
    # on inliers gathered at an annealed (shrinking) threshold, then
    # keep whichever model maximizes the MSAC score at the true threshold.
    # Refining the top lo_candidates hypotheses (not just the winner)
    # explores several basins — the winner by raw score is often NOT the
    # one whose locally-optimized model scores best.
    # The multiplier chain runs as ONE lax.scan step traced once (an
    # unrolled Python loop multiplies the traced refit subgraph — solver +
    # manifold LM + cheirality triangulation — by len(lo_multipliers),
    # which dominated trace/compile time of every RANSAC caller).
    def lo_chain(model, inlier_mask, score):
        def step(carry, mult):
            model, inlier_mask, score = carry
            w = ((scorer(model, *data) < threshold * mult) & mask).astype(jnp.float32)
            cand = refit(model, w, *data)
            r2 = scorer(cand, *data)
            r2 = jnp.where(jnp.isfinite(r2), r2, jnp.inf)
            s2 = msac(r2)
            inl2 = (r2 < threshold) & mask
            better = s2 >= score
            model = jax.tree.map(lambda a, b: jnp.where(better, a, b), cand, model)
            inlier_mask = jnp.where(better, inl2, inlier_mask)
            score = jnp.where(better, s2, score)
            return (model, inlier_mask, score), None

        (model, inlier_mask, score), _ = jax.lax.scan(
            step, (model, inlier_mask, score),
            jnp.asarray(lo_multipliers, jnp.float32))
        return model, inlier_mask, score

    if lo_candidates <= 1:
        model, inlier_mask, _ = lo_chain(jax.tree.map(lambda m: m[best], models),
                                         inl[best], scores[best])
        return model, inlier_mask, jnp.sum(inlier_mask)

    t = min(lo_candidates, hypotheses)
    top_scores, top = jax.lax.top_k(scores, t)
    ms, is_, ss = jax.vmap(lo_chain)(jax.tree.map(lambda m: m[top], models),
                                     inl[top], top_scores)
    b = jnp.argmax(ss)
    return jax.tree.map(lambda m: m[b], ms), is_[b], jnp.sum(is_[b])


def adaptive_num_hypotheses(inlier_ratio: float, sample_size: int, confidence: float = 0.999) -> int:
    """Classic RANSAC iteration bound N = log(1-p)/log(1-w^k).

    Host-side helper to choose the static hypothesis budget so the batched
    formulation meets the reference's confidence settings
    (prob 0.999 @ SfMStereoUtilities.cpp:97, 0.99 @ :226).
    """
    import math

    w = max(min(inlier_ratio, 0.999), 1e-3)
    denom = math.log(max(1e-12, 1.0 - w ** sample_size))
    if denom >= 0:
        return 1
    return max(1, int(math.ceil(math.log(1.0 - confidence) / denom)))
