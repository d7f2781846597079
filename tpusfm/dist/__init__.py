"""Distribution layer: device meshes, sharded matching, distributed BA.

The reference has NO distributed runtime (single-process shared memory +
std::thread, SfM.cpp:165-211; SURVEY.md §2.3). This package is the
TPU-native scaling story built in its place:

- pair-parallel feature matching sharded over the mesh (the analog of the
  reference's thread fan-out over image pairs),
- observation-sharded bundle adjustment: per-shard Schur reduction with a
  single psum of the reduced camera system over ICI,
- multi-host initialization via jax.distributed.

All collectives are XLA collectives over a named jax.sharding.Mesh; the
same code runs on a virtual CPU mesh (tests) and on TPU slices.
"""

from tpusfm.dist.mesh import make_mesh, mesh_from_config, initialize_distributed
from tpusfm.dist.matching import (match_all_pairs_sharded, match_all_pairs_ring,
                                  ring_matches_to_matrix)
from tpusfm.dist.ba import adjust_bundle_sharded
from tpusfm.dist.sparse_ba import adjust_bundle_sparse_sharded

__all__ = [
    "make_mesh",
    "mesh_from_config",
    "initialize_distributed",
    "match_all_pairs_sharded",
    "match_all_pairs_ring",
    "ring_matches_to_matrix",
    "adjust_bundle_sharded",
    "adjust_bundle_sparse_sharded",
]
