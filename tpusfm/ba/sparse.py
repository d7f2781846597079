"""Sparse (observation-list) Levenberg-Marquardt bundle adjustment.

The dense-grid solver (ba/lm.py) mirrors the framework's (N, V) track
table and is ideal for the incremental pipeline's sizes, but its
(V,6,V,6) Schur cross-term and (N,V)-grid Jacobians are dead weight at
collection scale (V=500 is 9 MB per iteration; V=5000 is 3.6 GB —
SURVEY.md §5's long-dimension configs). This module is the
TPU-native formulation for that scale:

  observations are a COO list (cam_idx, pt_idx, uv) of length O;
  per-observation residuals/Jacobians come from one vmap;
  all block sums are segment reductions (scatter-add);
  the reduced camera system S = U - W C^-1 W^T is NEVER materialized —
  a matrix-free preconditioned CG solves it with implicit matvecs that
  are two gathers + two segment-sums per application, so cost scales
  with O (observations), not V^2.

This is exactly how Ceres' ITERATIVE_SCHUR + SCHUR_JACOBI strategy maps
onto a TPU: MXU-free but VPU-dense, fully fused under jit, and the same
segment reductions shard over a device mesh with one psum per CG matvec
(the camera axis is replicated, observations are sharded).

Reference parity: the residual model, damping, accept/reject LM loop and
writeback semantics match ba/lm.py (SfMBundleAdjustmentUtils.cpp:99-222);
only the linear-algebra layout differs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpusfm import camera
from tpusfm.ba.lm import BASummary, _inv3x3

_EPS = 1e-12


class SparseBAProblem(NamedTuple):
    cams: jnp.ndarray      # (V, 6) angle-axis + translation
    points: jnp.ndarray    # (N, 3)
    focal: jnp.ndarray     # () shared focal
    cam_idx: jnp.ndarray   # (O,) int32
    pt_idx: jnp.ndarray    # (O,) int32
    uv: jnp.ndarray        # (O, 2) pixel coords, principal point subtracted
    w: jnp.ndarray         # (O,) observation weights (0 = padding)
    cam_free: jnp.ndarray  # (V,) 1.0 for optimizable cameras


def _residual_obs(cam, X, focal, uv):
    """Reference BA residual per observation
    (SfMBundleAdjustmentUtils.cpp:58-97)."""
    p = camera.rotate_angle_axis(cam[:3], X) + cam[3:]
    z = p[2]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    return p[:2] / zsafe * focal - uv


def _all_residuals(cams, points, focal, prob: SparseBAProblem):
    def one(ci, pi, uv):
        return _residual_obs(cams[ci], points[pi], focal, uv)

    return jax.vmap(one)(prob.cam_idx, prob.pt_idx, prob.uv)


def _cost(cams, points, focal, prob: SparseBAProblem,
          huber_delta: float = 0.0):
    r = _all_residuals(cams, points, focal, prob)
    if huber_delta <= 0.0:
        return 0.5 * jnp.sum(prob.w[:, None] * r * r)
    # robust cost over the 2D residual norm: rho(e) = e^2/2 for e <= d,
    # d*(e - d/2) beyond — large residuals (e.g. loop-closure
    # observations under drifted poses) keep pulling linearly instead of
    # dominating quadratically or being discarded
    e2 = jnp.sum(r * r, axis=1)
    e = jnp.sqrt(e2 + _EPS)
    rho = jnp.where(e <= huber_delta, 0.5 * e2,
                    huber_delta * (e - 0.5 * huber_delta))
    return jnp.sum(prob.w * rho)


def _huber_w(prob: SparseBAProblem, huber_delta: float):
    """IRLS weights at the current state: w * min(1, delta/||r||)."""
    if huber_delta <= 0.0:
        return prob.w
    r = _all_residuals(prob.cams, prob.points, prob.focal, prob)
    e = jnp.sqrt(jnp.sum(r * r, axis=1) + _EPS)
    return prob.w * jnp.minimum(1.0, huber_delta / e)


def _obs_jacobians(prob: SparseBAProblem):
    """Per-observation residual + Jacobians: r (O,2), Jc (O,2,6),
    Jp (O,2,3), Jf (O,2)."""

    def one(ci, pi, uv):
        cam = prob.cams[ci]
        X = prob.points[pi]
        f = lambda c, x, fo: _residual_obs(c, x, fo, uv)
        r = f(cam, X, prob.focal)
        Jc, Jp, Jf = jax.jacfwd(f, argnums=(0, 1, 2))(cam, X, prob.focal)
        return r, Jc, Jp, Jf

    return jax.vmap(one)(prob.cam_idx, prob.pt_idx, prob.uv)


def _pcg(matvec, precond, b_c, b_f, iters: int):
    """Preconditioned CG on the (camera blocks, focal) pair-pytree."""

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + a[1] * b[1]

    x = (jnp.zeros_like(b_c), jnp.zeros_like(b_f))
    r = (b_c, b_f)
    z = precond(r)
    p = z
    rz = dot(r, z)

    def body(_, state):
        x, r, p, rz = state
        Ap = matvec(p)
        denom = dot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = (z[0] + beta * p[0], z[1] + beta * p[1])
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def _lm_step_sparse(prob: SparseBAProblem, lam, share_focal: bool,
                    cg_iterations: int, axis_name: str | None = None,
                    huber_delta: float = 0.0):
    """One damped Schur solve with implicit (matrix-free) camera system."""
    V = prob.cams.shape[0]
    N = prob.points.shape[0]
    r, Jc, Jp, Jf = _obs_jacobians(prob)
    # IRLS: the robust loss enters as per-observation reweighting of the
    # Gauss-Newton system, recomputed at every LM step [Triggs'00 §3.3]
    w = _huber_w(prob, huber_delta)
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    wJf = Jf * w[:, None]
    ci, pi = prob.cam_idx, prob.pt_idx

    def seg_cam(vals):
        out = jnp.zeros((V,) + vals.shape[1:], vals.dtype).at[ci].add(vals)
        return jax.lax.psum(out, axis_name) if axis_name else out

    def seg_pt(vals):
        # points live wholly on one shard in the distributed layout — no psum
        return jnp.zeros((N,) + vals.shape[1:], vals.dtype).at[pi].add(vals)

    def psum0(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # diagonal blocks + gradients
    U = seg_cam(jnp.einsum("oia,oib->oab", wJc, Jc))          # (V,6,6)
    Udiag = jnp.einsum("vaa->va", U)                           # (V,6)
    Uff = psum0(jnp.sum(wJf * Jf))
    C = seg_pt(jnp.einsum("oia,oib->oab", wJp, Jp))            # (N,3,3)
    b_c = seg_cam(jnp.einsum("oia,oi->oa", wJc, r))            # (V,6)
    b_p = seg_pt(jnp.einsum("oia,oi->oa", wJp, r))             # (N,3)
    b_f = psum0(jnp.sum(wJf * r))

    eye3 = jnp.eye(3, dtype=C.dtype)
    Cd = C + lam * (C * eye3) + 1e-8 * eye3
    Cinv = _inv3x3(Cd)

    free = prob.cam_free                                        # (V,)
    f_free = jnp.asarray(1.0 if share_focal else 0.0, r.dtype)

    def matvec(x):
        xc, xf = x
        xc = xc * free[:, None]
        xf = xf * f_free
        xg = xc[ci]                                             # (O,6)
        t = jnp.einsum("oij,oj->oi", Jc, xg) + Jf * xf          # (O,2)
        a_c = seg_cam(jnp.einsum("oij,oj->oi", jnp.swapaxes(wJc, 1, 2), t))
        a_c = a_c + (lam * Udiag + 1e-8) * xc
        a_f = psum0(jnp.sum(wJf * t)) + (lam * Uff + 1e-8) * xf
        # subtract W C^-1 W^T x (the Schur correction)
        y = seg_pt(jnp.einsum("oia,oi->oa", wJp, t))            # (N,3)
        z = jnp.einsum("nab,nb->na", Cinv, y)
        s = jnp.einsum("oia,oa->oi", Jp, z[pi])                 # (O,2)
        a_c = a_c - seg_cam(jnp.einsum("oia,oi->oa", wJc, s))
        a_f = a_f - psum0(jnp.sum(wJf * s))
        # frozen rows act as identity so CG stays SPD
        a_c = jnp.where(free[:, None] > 0, a_c, x[0])
        a_f = jnp.where(f_free > 0, a_f, x[1])
        return a_c, a_f

    # block-Jacobi preconditioner on the damped camera blocks
    eye6 = jnp.eye(6, dtype=U.dtype)
    Ud = U + lam * (U * eye6) + 1e-6 * eye6
    Pc = jnp.linalg.inv(Ud)                                     # (V,6,6)
    Pf = 1.0 / jnp.maximum(lam * Uff + Uff + 1e-8, 1e-8)

    def precond(rr):
        rc, rf = rr
        return (jnp.einsum("vab,vb->va", Pc, rc) * free[:, None]
                + rc * (1.0 - free[:, None]),
                jnp.where(f_free > 0, rf * Pf, rf))

    # Schur RHS
    z0 = jnp.einsum("nab,nb->na", Cinv, b_p)
    s0 = jnp.einsum("oia,oa->oi", Jp, z0[pi])
    rhs_c = (b_c - seg_cam(jnp.einsum("oia,oi->oa", wJc, s0))) * free[:, None]
    rhs_f = (b_f - psum0(jnp.sum(wJf * s0))) * f_free

    d_c, d_f = _pcg(matvec, precond, rhs_c, rhs_f, cg_iterations)
    d_c = d_c * free[:, None]
    d_f = d_f * f_free

    # point back-substitution — local: in the distributed layout the point
    # axis is SHARDED and every point's observations live on its own shard
    # (dist/sparse_ba.py groups them), so no collective is needed here.
    t = jnp.einsum("oij,oj->oi", Jc, d_c[ci]) + Jf * d_f
    y = seg_pt(jnp.einsum("oia,oi->oa", wJp, t))
    d_p = jnp.einsum("nab,nb->na", Cinv, b_p - y)
    d_c = jnp.where(jnp.isfinite(d_c), d_c, 0.0)
    d_p = jnp.where(jnp.isfinite(d_p), d_p, 0.0)
    d_f = jnp.where(jnp.isfinite(d_f), d_f, 0.0)

    # predicted decrease for the LM gain ratio (x <- x - delta):
    # 0.5 * delta^T (lam D delta + g); camera/focal terms are replicated,
    # the point term is shard-local
    Cdiag = jnp.einsum("naa->na", C)
    pred_cam = 0.5 * (jnp.sum(d_c * (lam * Udiag * d_c + b_c))
                      + d_f * (lam * Uff * d_f + b_f))
    pred_pt = 0.5 * jnp.sum(d_p * (lam * Cdiag * d_p + b_p))
    if axis_name:
        pred_pt = jax.lax.psum(pred_pt, axis_name)
    return d_c, d_p, d_f, pred_cam + pred_pt


def lm_solve_sparse(
    prob: SparseBAProblem,
    *,
    max_iterations: int = 50,
    function_tolerance: float = 1e-6,
    initial_lambda: float = 1e-3,
    share_focal: bool = True,
    cg_iterations: int = 32,
    axis_name: str | None = None,
    huber_delta: float = 0.0,
):
    """LM driver over the sparse problem — same accept/reject and
    termination semantics as ba/lm.py lm_solve. huber_delta > 0 turns on
    a Huber robust loss (IRLS reweighting) at that pixel scale."""
    cost0 = _cost(prob.cams, prob.points, prob.focal, prob, huber_delta)
    if axis_name:
        cost0 = jax.lax.psum(cost0, axis_name)

    def cond(state):
        it, _, _, _, _, done, _ = state
        return (it < max_iterations) & ~done

    def body(state):
        it, p, lam, nu, cost, done, rejects = state
        d_c, d_p, d_f, pred = _lm_step_sparse(p, lam, share_focal,
                                              cg_iterations, axis_name,
                                              huber_delta)
        new_cams = p.cams - d_c
        new_points = p.points - d_p
        new_focal = p.focal - d_f
        p_try = p._replace(cams=new_cams, points=new_points, focal=new_focal)
        new_cost = _cost(new_cams, new_points, new_focal, p_try, huber_delta)
        if axis_name:
            new_cost = jax.lax.psum(new_cost, axis_name)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        p2 = p._replace(
            cams=jnp.where(accept, new_cams, p.cams),
            points=jnp.where(accept, new_points, p.points),
            focal=jnp.where(accept, new_focal, p.focal),
        )
        # Nielsen/Ceres gain-ratio damping schedule (see ba/lm.py)
        rho = (cost - new_cost) / jnp.maximum(pred, _EPS)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam2 = jnp.where(accept, jnp.maximum(lam * shrink, 1e-10),
                         jnp.minimum(lam * nu, 1e8))
        nu2 = jnp.where(accept, 2.0, jnp.minimum(nu * 2.0, 64.0))
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, _EPS)
        rejects2 = jnp.where(accept, 0, rejects + 1)
        # the tolerance exit counts only for genuine trust-region steps
        # (rho > 0.5, i.e. lambda shrank): an accepted-but-heavily-damped
        # micro-step has a tiny relative decrease without being converged
        done2 = (accept & (rel < function_tolerance) & (rho > 0.5)) \
            | (rejects2 >= 5)
        cost2 = jnp.where(accept, new_cost, cost)
        return (it + 1, p2, lam2, nu2, cost2, done2, rejects2)

    it, pf, lam, nu, costf, done, _ = jax.lax.while_loop(
        cond, body,
        (jnp.array(0), prob, jnp.array(initial_lambda, prob.cams.dtype),
         jnp.asarray(2.0, prob.cams.dtype), cost0, jnp.array(False),
         jnp.array(0)),
    )
    return pf, BASummary(initial_cost=cost0, final_cost=costf,
                         iterations=it, converged=done)


def adjust_bundle_sparse(
    poses_Rt: jnp.ndarray,      # (V, 3, 4)
    cam_valid: jnp.ndarray,     # (V,)
    points: jnp.ndarray,        # (N, 3)
    cam_idx: jnp.ndarray,       # (O,) int32
    pt_idx: jnp.ndarray,        # (O,) int32
    uv: jnp.ndarray,            # (O, 2) raw pixel observations
    obs_w: jnp.ndarray,         # (O,) weights (0 = padding)
    K: jnp.ndarray,             # (3, 3)
    *,
    max_iterations: int = 50,
    function_tolerance: float = 1e-6,
    initial_lambda: float = 1e-3,
    share_focal: bool = True,
    cg_iterations: int = 32,
    huber_delta: float = 0.0,
):
    """High-level sparse BA with the adjustBundle API shape
    (SfMBundleAdjustmentUtils.h:35-50) over a COO observation list."""
    V = poses_Rt.shape[0]
    rvecs = camera.matrix_to_rodrigues_b(poses_Rt[:, :, :3].reshape(V, 3, 3))
    cams = jnp.concatenate([rvecs, poses_Rt[:, :, 3]], axis=1)
    pp = K[:2, 2]
    prob = SparseBAProblem(
        cams=cams, points=points, focal=K[0, 0],
        cam_idx=cam_idx, pt_idx=pt_idx, uv=uv - pp[None, :],
        w=obs_w.astype(points.dtype),
        cam_free=cam_valid.astype(points.dtype),
    )
    sol, summary = lm_solve_sparse(
        prob, max_iterations=max_iterations,
        function_tolerance=function_tolerance,
        initial_lambda=initial_lambda, share_focal=share_focal,
        cg_iterations=cg_iterations, huber_delta=huber_delta)
    R = camera.rodrigues_to_matrix_b(sol.cams[:, :3])
    out_Rt = jnp.concatenate([R, sol.cams[:, 3:, None]], axis=2)
    out_Rt = jnp.where(cam_valid[:, None, None], out_Rt, poses_Rt)
    newK = K.at[0, 0].set(sol.focal).at[1, 1].set(sol.focal)
    return out_Rt, sol.points, newK, summary
