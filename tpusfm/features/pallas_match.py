"""Pallas TPU kernel: fused brute-force matcher with streaming top-2.

The jnp matcher (features/match.py) materializes the full (F1, F2)
distance matrix per pair before running top-k; at the reference's feature
count (5000/image, SfM2DFeatureUtilities.cpp:39) that is 100 MB per pair
and the HBM round-trip dominates. This kernel streams desc2 in tiles
through VMEM, accumulates each row's best/second-best distance and best
index directly in the (VMEM-resident) output blocks across grid steps,
and never writes the distance matrix — arithmetic stays on the MXU and
HBM traffic drops from O(F^2) to O(F*D).

Grid: (P pairs, F1/TI, F2/TJ). TPU grids execute sequentially per core
and an output block whose index map is constant along a grid axis stays
resident in VMEM across those steps — the standard accumulator pattern.

TRANSPOSED distance tile: the per-tile distances are computed as
(TJ, TI) = d2_tile · d1_tileᵀ, NOT (TI, TJ). The top-2 reduction then
runs over axis 0 — the SUBLANE direction — where the VPU reduces with
cheap register trees; reducing across the 128-wide LANE direction costs
log2(128) cross-lane shuffles per step and measured ~5x slower end to
end. Recorded throughput (SCALE_BENCH.json, one v5e chip): 663 pairs/s
with the f32 path -> 2915 pairs/s @ 5120 feats with the int8 MXU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _make_kernel(ti: int, tj: int, bits: int, use_int8: bool):
    """Streaming top-2 kernel closure (transposed orientation).

    use_int8: ±1 descriptors as int8 feed the MXU at its int8 rate
    (4-8x the f32 passes on v5e); Hamming distances are exact integers
    either way, so the two dtypes produce bit-identical match outputs
    (argmin tie-breaking picks the first minimum in both).

    Mosaic quirks that shape this form (bisected against this build's
    remote compiler, which rejects superficially-equivalent variants):
      * the i8 matmul must pin precision=DEFAULT — the package-global
        jax_default_matmul_precision="highest" (tpusfm/__init__.py)
        would stamp contract_precision<fp32> onto it ("Bad lhs type");
      * d2 arrives UN-transposed as (TJ, D) blocks and the contraction
        is last-dim x last-dim via dot_general, keeping both operands in
        their natural layout;
      * the i32 matmul result must flow straight into a convert, and
        the tile constants are baked as closure literals.
    """

    def kern(a, b, v, best, second, idx):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            best[0, 0, :] = jnp.full((ti,), _BIG, jnp.float32)
            second[0, 0, :] = jnp.full((ti,), _BIG, jnp.float32)
            idx[0, 0, :] = jnp.zeros((ti,), jnp.int32)

        if use_int8:
            dots = jax.lax.dot_general(
                b[0], a[0], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)        # (TJ, TI)
            dist = 0.5 * (bits - dots.astype(jnp.float32))
        else:
            # f32 needs HIGHEST: DEFAULT may run bf16 passes on the MXU
            # and ±1 dot products must stay exact integers
            dots = jax.lax.dot_general(
                b[0], a[0], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)        # (TJ, TI)
            dist = 0.5 * (bits - dots)
        vt = v[0, 0, pl.ds(j * tj, tj)]
        dist = jnp.where(vt[:, None] > 0, dist, _BIG)       # (TJ, TI)

        # per-column top-2 within this tile: axis 0 = sublanes = cheap
        t1 = jnp.min(dist, axis=0)                          # (TI,)
        arg = jnp.argmin(dist, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
        t2 = jnp.min(jnp.where(rows == arg[None, :], _BIG, dist), axis=0)
        tidx = (j * tj + arg).astype(jnp.int32)

        # merge running (best, second, idx) with this tile's (t1, t2)
        bb = best[0, 0, :]
        ss = second[0, 0, :]
        bi = idx[0, 0, :]
        best[0, 0, :] = jnp.minimum(bb, t1)
        second[0, 0, :] = jnp.minimum(jnp.maximum(bb, t1), jnp.minimum(ss, t2))
        idx[0, 0, :] = jnp.where(t1 < bb, tidx, bi)

    return kern


@functools.partial(jax.jit, static_argnames=("interpret", "use_int8"))
def match_topk2_pallas(desc1: jnp.ndarray, desc2: jnp.ndarray,
                       valid2: jnp.ndarray, *, interpret: bool = False,
                       use_int8: bool = True):
    """Batched streaming top-2 matcher.

    desc1, desc2: (P, F, D) +-1 descriptors; valid2: (P, F) bool.
    Returns (best (P,F), second (P,F), best_idx (P,F) int32): the two
    smallest Hamming distances from each desc1 row to desc2, and the
    argmin. F must be a multiple of 256.

    use_int8 (default): feed the MXU int8 operands — bit-identical
    outputs (integer distances either way), ~4x the f32 matmul rate.
    """
    P, F1, D = desc1.shape
    F2 = desc2.shape[1]
    assert F1 % 256 == 0 and F2 % 256 == 0, \
        f"F1={F1}, F2={F2} must be multiples of 256"
    TJ = 512 if F2 % 512 == 0 else 256
    # tile the query axis too (bounds VMEM per step): largest multiple of
    # 256 that divides F1, so every F1 % 256 == 0 feature budget works
    # (1536 -> 768, 1792 -> 256, ...)
    TI = next(t for t in (1024, 768, 512, 256) if F1 % t == 0)

    kernel = _make_kernel(TI, TJ, D, use_int8)
    dt = jnp.int8 if use_int8 else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(P, F1 // TI, F2 // TJ),
        in_specs=[
            pl.BlockSpec((1, TI, D), lambda p, i, j: (p, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ, D), lambda p, i, j: (p, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F2), lambda p, i, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TI), lambda p, i, j: (p, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TI), lambda p, i, j: (p, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TI), lambda p, i, j: (p, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1, F1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, F1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, F1), jnp.int32),
        ],
        interpret=interpret,
    )(desc1.astype(dt), desc2.astype(dt), valid2.astype(jnp.int32)[:, None, :])
    return out[0][:, 0], out[1][:, 0], out[2][:, 0]


def match_pairs_pallas(
    features_desc: jnp.ndarray,   # (V, F, D)
    features_valid: jnp.ndarray,  # (V, F)
    pair_indices: jnp.ndarray,    # (P, 2)
    *,
    ratio: float = 0.8,
    max_matches: int = 1024,
    interpret: bool = False,
):
    """Full pair-matching stage on the Pallas kernel -> types.Matches.

    Same acceptance semantics as features/match.py::match_pair (Lowe ratio
    0.8, SfM2DFeatureUtilities.cpp:60-68), fixed match capacity.
    """
    from tpusfm.types import Matches

    d1 = features_desc[pair_indices[:, 0]]
    d2 = features_desc[pair_indices[:, 1]]
    v1 = features_valid[pair_indices[:, 0]]
    v2 = features_valid[pair_indices[:, 1]]
    best, second, bidx = match_topk2_pallas(d1, d2, v2, interpret=interpret)

    ok = (best < ratio * second) & (best < _BIG * 0.5) & v1
    score = jnp.where(ok, -best, -jnp.inf)
    sel_score, sel = jax.lax.top_k(score, max_matches)
    sel_ok = jnp.isfinite(sel_score)
    left = jnp.where(sel_ok, sel, -1).astype(jnp.int32)
    right = jnp.where(sel_ok, jnp.take_along_axis(bidx, sel, axis=1), -1).astype(jnp.int32)
    return Matches(
        idx=jnp.stack([left, right], axis=2),
        dist=jnp.where(sel_ok, -sel_score, _BIG).astype(jnp.float32),
        valid=sel_ok,
    )
