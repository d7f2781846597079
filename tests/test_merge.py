"""Unit tests for the full mergeNewPointCloud semantics (SfM.cpp:530-629).

Covers the numpy path (SfMPipeline._insert_points) and the native C++
path (csrc/trackgraph.cc tpusfm_insert_points_v2), asserting:
  - two independently-triangulated coincident points FUSE when a 2D
    feature match (distance < 20) confirms them,
  - close-but-unconfirmed points are DROPPED (SfM.cpp:596-600),
  - far points append,
  - exact-feature and transitive (strengthening) claims attach.
"""
import numpy as np
import pytest

from tpusfm import SfMConfig
from tpusfm.pipeline import SfMPipeline


V, F, M = 3, 32, 8


def make_pipe(native_off=False, strengthen=True):
    cfg = SfMConfig(max_features=F, max_matches=M, console_debug_level=5,
                    cross_view_strengthen=strengthen)
    pipe = SfMPipeline(np.zeros((V, 32, 32), np.float32), cfg)
    pipe.pairs = [(i, j) for i in range(V) for j in range(i + 1, V)]
    pipe.pair_of = {p: n for n, p in enumerate(pipe.pairs)}
    P = len(pipe.pairs)
    pipe.match_idx = np.full((P, M, 2), -1, np.int32)
    pipe.match_valid = np.zeros((P, M), bool)
    pipe.match_dist = np.full((P, M), 1e9, np.float32)

    def add_match(i, j, fi, fj, dist):
        p = pipe.pair_of[(i, j)]
        slot = int(pipe.match_valid[p].sum())
        pipe.match_idx[p, slot] = (fi, fj)
        pipe.match_valid[p, slot] = True
        pipe.match_dist[p, slot] = dist

    # pair (0,1): 2<->3 close match; 8<->16 (for the transitive test)
    add_match(0, 1, 2, 3, 5.0)
    add_match(0, 1, 8, 16, 4.0)
    # pair (0,2): 2<->6 close match (confirms the coincident-point fusion)
    add_match(0, 2, 2, 6, 5.0)
    if native_off:
        import tpusfm.native as native

        pipe._native_off = pytest.MonkeyPatch()
        pipe._native_off.setattr(native, "available", lambda: False)
    return pipe


@pytest.mark.parametrize("use_native", [False, True])
def test_merge_semantics(use_native):
    if use_native:
        from tpusfm import native

        if not native.available():
            pytest.skip("native runtime not built")
    pipe = make_pipe(native_off=not use_native)
    try:
        # 1. seed point A from pair (0,1), features (2, 3)
        pipe._insert_points(np.array([[1.0, 1.0, 1.0]], np.float32),
                            0, np.array([2]), 1, np.array([3]))
        assert pipe.n_points == 1
        assert pipe.obs[0, 0] == 2 and pipe.obs[0, 1] == 3

        # 2. coincident point from pair (1,2), features (9, 6): within
        #    0.01 of A and CONFIRMED by match (0,2): 2<->6 dist 5 -> fuse
        pipe._insert_points(np.array([[1.0, 1.0, 1.005]], np.float32),
                            1, np.array([9]), 2, np.array([6]))
        assert pipe.n_points == 1, "coincident confirmed point must fuse"
        assert pipe.obs[0, 2] == 6
        assert pipe.feat2point[2, 6] == 0

        # 3. close but UNCONFIRMED point from (1,2), features (10, 11):
        #    dropped, not appended (SfM.cpp:596-600)
        pipe._insert_points(np.array([[1.0, 1.0, 1.002]], np.float32),
                            1, np.array([10]), 2, np.array([11]))
        assert pipe.n_points == 1, "close unconfirmed point must be dropped"

        # 4. far point appends
        pipe._insert_points(np.array([[5.0, 5.0, 5.0]], np.float32),
                            1, np.array([12]), 2, np.array([13]))
        assert pipe.n_points == 2

        # 5. exact-feature claim: feature 2 of view 0 already belongs to A
        pipe._insert_points(np.array([[9.0, 9.0, 9.0]], np.float32),
                            0, np.array([2]), 1, np.array([14]))
        assert pipe.n_points == 2
        assert pipe.obs[0, 1] == 14          # view-1 obs updated to 14

        # 6. transitive claim (strengthening): feature 16 of view 1 matches
        #    feature 8 of view 0, which we hand to A -> attach
        pipe.feat2point[0, 8] = 0
        pipe._insert_points(np.array([[9.0, 9.0, 9.0]], np.float32),
                            1, np.array([16]), 2, np.array([17]))
        assert pipe.n_points == 2, "transitive claim must attach, not append"
        assert pipe.obs[0, 2] == 17
    finally:
        if hasattr(pipe, "_native_off"):
            pipe._native_off.undo()


def test_merge_native_matches_numpy():
    """Native and numpy paths produce identical state on a random workload."""
    from tpusfm import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(3)
    states = []
    for use_native in (True, False):
        pipe = make_pipe(native_off=not use_native)
        try:
            rng2 = np.random.default_rng(7)
            for _ in range(6):
                k = rng2.integers(1, 5)
                i, j = sorted(rng2.choice(V, 2, replace=False))
                fi = rng2.choice(F, k, replace=False).astype(np.int32)
                fj = rng2.choice(F, k, replace=False).astype(np.int32)
                xyz = rng2.uniform(0, 2, (k, 3)).astype(np.float32)
                pipe._insert_points(xyz, int(i), fi, int(j), fj)
            states.append((pipe.n_points, pipe.xyz[:pipe.n_points].copy(),
                           pipe.obs[:pipe.n_points].copy(),
                           pipe.feat2point.copy()))
        finally:
            if hasattr(pipe, "_native_off"):
                pipe._native_off.undo()
    (n1, x1, o1, f1), (n2, x2, o2, f2) = states
    assert n1 == n2
    np.testing.assert_allclose(x1, x2)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(f1, f2)
