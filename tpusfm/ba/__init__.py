"""Bundle adjustment: batched Levenberg-Marquardt with Schur complement.

TPU-native re-design of the reference's two BA backends:
- modern: Ceres AutoDiff reprojection + DENSE_SCHUR
  (SfMToyLib/SfMBundleAdjustmentUtils.cpp:99-222)
- legacy: SSBA CommonInternalsMetricBundleOptimizer / cv LevMarqSparse
  (legacy/SfMToyLib_Old/BundleAdjuster.cpp:102-399)

The residual model is identical to the reference's SimpleReprojectionError
(angle-axis rotate -> translate -> perspective divide -> shared focal,
principal point pre-subtracted; SfMBundleAdjustmentUtils.cpp:58-97), which
the reference's own ceres_reprojection_test pins (SfMUnitTests.cpp:153-189).
Jacobians come from jax.jacfwd over the dense (point x view) observation
grid; the reduced camera system is formed with einsums and solved densely
— the same DENSE_SCHUR structure, but batched and jit-compiled.
"""

from tpusfm.ba.lm import BAProblem, BASummary, adjust_bundle, lm_solve, reprojection_rms

__all__ = ["BAProblem", "BASummary", "adjust_bundle", "lm_solve", "reprojection_rms"]
