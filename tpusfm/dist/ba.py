"""Distributed bundle adjustment: observation-sharded Schur reduction.

The reference solves BA serially with Ceres DENSE_SCHUR
(SfMBundleAdjustmentUtils.cpp:172). The TPU-native design (SURVEY.md §2.3)
shards the POINT axis over the mesh: each device owns a block of map
points and all their observations, reduces them into its partial
(6V+1)-dim camera+focal system, and one psum over ICI forms the global
reduced system. The dense solve is replicated (it is tiny relative to the
reduction), and point back-substitution is embarrassingly local. The
whole LM loop — damping, accept/reject, convergence — runs INSIDE
shard_map, so one jit compile covers the entire distributed solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm import camera
from tpusfm.ba.lm import BAProblem, lm_solve


def adjust_bundle_sharded(
    mesh: Mesh,
    poses_Rt: jnp.ndarray,       # (V, 3, 4)
    cam_valid: jnp.ndarray,      # (V,)
    points: jnp.ndarray,         # (N, 3), N divisible by mesh size
    pt_valid: jnp.ndarray,       # (N,)
    uv: jnp.ndarray,             # (N, V, 2)
    obs_mask: jnp.ndarray,       # (N, V)
    K: jnp.ndarray,              # (3, 3)
    *,
    max_iterations: int = 50,
    function_tolerance: float = 1e-6,
    share_focal: bool = True,
):
    """Distributed equivalent of ba.adjust_bundle. Same returns."""
    axis = mesh.axis_names[0]
    V = poses_Rt.shape[0]
    rvecs = camera.matrix_to_rodrigues_b(poses_Rt[:, :, :3])
    cams = jnp.concatenate([rvecs, poses_Rt[:, :, 3]], axis=1)
    pp = K[:2, 2]

    def local(cams, points, pt_valid, uv, obs_mask, cam_valid, focal):
        prob = BAProblem(
            cams=cams,
            points=points,
            focal=focal,
            uv=uv,
            mask=obs_mask,
            cam_valid=cam_valid,
            pt_valid=pt_valid,
        )
        sol, summary = lm_solve(
            prob,
            max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            share_focal=share_focal,
            axis_name=axis,
        )
        return sol.cams, sol.points, sol.focal, summary

    # jit around shard_map is required, not a nicety: an eagerly-executed
    # shard_map dispatches every traced primitive as its own multi-device
    # program (hundreds of micro-compiles per call)
    fn = jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P(), P()),
    ))
    out_cams, out_points, out_focal, summary = fn(
        cams, points, pt_valid, uv - pp[None, None, :], obs_mask, cam_valid, K[0, 0]
    )
    R = camera.rodrigues_to_matrix_b(out_cams[:, :3])
    out_Rt = jnp.concatenate([R, out_cams[:, 3:, None]], axis=2)
    newK = K.at[0, 0].set(out_focal).at[1, 1].set(out_focal)
    return out_Rt, out_points, newK, summary
