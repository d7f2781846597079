"""Incremental SfM pipeline orchestrator.

TPU-native re-design of the reference orchestrators (SfMToyLib/SfM.{h,cpp}
and legacy MultiCameraPnP): device work is batched, jit-compiled kernels
with static shapes; the data-dependent outer loop (which view to register
next, did the pose gate pass) runs in host Python on tiny gathered arrays
— exactly the split SURVEY.md §7 prescribes.
"""

from tpusfm.pipeline.incremental import SfMPipeline, Reconstruction, run_sfm
from tpusfm.pipeline.two_view import reconstruct_two_view
from tpusfm.pipeline.collection import (
    CollectionPipeline, CollectionReconstruction, window_pairs)

__all__ = ["SfMPipeline", "Reconstruction", "run_sfm", "reconstruct_two_view",
           "CollectionPipeline", "CollectionReconstruction", "window_pairs"]
