"""Feature layer: batched detection, description, and MXU matching.

TPU-native re-design of the reference feature layer
(SfMToyLib/SfM2DFeatureUtilities.{h,cpp} — ORB 5000 kp + BruteForce-Hamming
kNN ratio matching; legacy RichFeatureMatcher.cpp cross-check matching).
Detection is a fully batched FAST-segment-test + Harris-ranked pipeline
over an image pyramid; descriptors are steered-BRIEF bits stored as +-1
vectors so Hamming distance compiles to a single MXU matmul.
"""

from tpusfm.features.detect import extract_features, fast_harris_response
from tpusfm.features.match import (
    match_pair,
    match_all_pairs,
    hamming_distance_matrix,
    l2_distance_matrix,
)

__all__ = [
    "extract_features",
    "fast_harris_response",
    "match_pair",
    "match_all_pairs",
    "hamming_distance_matrix",
    "l2_distance_matrix",
]
