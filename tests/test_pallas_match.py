"""Pallas matcher kernel tests (interpret mode on the CPU mesh)."""
import jax.numpy as jnp
import numpy as np

from tpusfm.features.match import hamming_distance_matrix, match_pair
from tpusfm.features.pallas_match import match_pairs_pallas, match_topk2_pallas


def _random_descs(P, F, D, seed=0):
    rng = np.random.default_rng(seed)
    d1 = np.sign(rng.standard_normal((P, F, D))).astype(np.float32)
    d2 = np.sign(rng.standard_normal((P, F, D))).astype(np.float32)
    return d1, d2


def test_streaming_top2_matches_dense():
    P, F, D = 2, 512, 256
    d1, d2 = _random_descs(P, F, D)
    v2 = np.ones((P, F), bool)
    v2[:, -13:] = False
    best, second, idx = match_topk2_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2), interpret=True)
    for p in range(P):
        dm = np.array(hamming_distance_matrix(jnp.asarray(d1[p]), jnp.asarray(d2[p])))
        dm[:, ~v2[p]] = 1e9
        srt = np.sort(dm, axis=1)
        np.testing.assert_allclose(np.array(best[p]), srt[:, 0])
        np.testing.assert_allclose(np.array(second[p]), srt[:, 1])
        # index must point at A smallest entry (ties may break differently)
        np.testing.assert_allclose(dm[np.arange(F), np.array(idx[p])], srt[:, 0])


def test_int8_kernel_matches_f32_kernel():
    """The int8 MXU path must be bit-identical to the f32 path (VERDICT r3
    #6: raise matcher MFU with unchanged match outputs)."""
    P, F, D = 2, 512, 256
    d1, d2 = _random_descs(P, F, D, seed=7)
    v2 = np.ones((P, F), bool)
    v2[:, -29:] = False
    a = match_topk2_pallas(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
                           interpret=True, use_int8=False)
    b = match_topk2_pallas(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
                           interpret=True, use_int8=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.array(x), np.array(y))


def test_match_pairs_pallas_agrees_with_jnp_matcher():
    P, F, D = 1, 256, 256
    rng = np.random.default_rng(3)
    base = np.sign(rng.standard_normal((F, D))).astype(np.float32)
    flip = np.sign(rng.uniform(0, 1, (F, D)) - 0.03).astype(np.float32)
    desc = np.stack([base, base * flip])  # two views, ~3% bit noise
    valid = np.ones((2, F), bool)
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    m_pallas = match_pairs_pallas(jnp.asarray(desc), jnp.asarray(valid), pairs,
                                  max_matches=128, interpret=True)
    m_jnp = match_pair(jnp.asarray(desc[0]), jnp.asarray(valid[0]),
                       jnp.asarray(desc[1]), jnp.asarray(valid[1]), max_matches=128)
    np.testing.assert_array_equal(np.array(m_pallas.valid[0]), np.array(m_jnp.valid))
    sel = np.array(m_jnp.valid)
    np.testing.assert_array_equal(np.array(m_pallas.idx[0])[sel], np.array(m_jnp.idx)[sel])


def test_nonpow2_tile_feature_counts():
    """Feature budgets that are multiples of 256 but not of 1024
    (1536, 1792) must pick a dividing query tile instead of asserting
    (advisor r4: configs passing the % 256 gate crashed at trace time)."""
    for F in (1536, 1792):
        d1, d2 = _random_descs(1, F, 256, seed=F)
        v2 = np.ones((1, F), bool)
        best, second, idx = match_topk2_pallas(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
            interpret=True, use_int8=False)
        dm = np.array(hamming_distance_matrix(jnp.asarray(d1[0]), jnp.asarray(d2[0])))
        srt = np.sort(dm, axis=1)
        np.testing.assert_allclose(np.array(best[0]), srt[:, 0])
        np.testing.assert_allclose(
            dm[np.arange(F), np.array(idx[0])], srt[:, 0])
