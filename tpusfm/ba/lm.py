"""Levenberg-Marquardt bundle adjustment with dense Schur complement.

Problem layout (all static shapes, masked):
  cameras:  (V, 6) angle-axis + translation       [reference: 6-param camera,
                                                   SfMBundleAdjustmentUtils.cpp:111-135]
  points:   (N, 3)
  focal:    scalar, shared across cameras          [.cpp:138,164]
  observations: dense (N, V) grid — uv[n, v] is where view v sees point n,
    mask[n, v] marks real observations. This grid IS the framework's
    track-graph layout (types.PointCloud.obs), so BA consumes the
    reconstruction state with zero repacking.

The normal equations have the classic SfM arrowhead structure; we eliminate
the 3x3 point blocks in closed form (adjugate inverse) and solve the reduced
(6V+1) camera+focal system densely — the exact DENSE_SCHUR strategy Ceres
uses for the reference (SfMBundleAdjustmentUtils.cpp:172), but built from
three einsums instead of sparse bookkeeping, so XLA maps it onto the MXU.
The LM loop is a lax.while_loop with Ceres-style multiplicative damping and
accept/reject steps; a Jacobi (symmetric diagonal) rescale of the reduced
system keeps the solve well-conditioned in float32 (Ceres runs float64; see
SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpusfm import camera

_EPS = 1e-12


class BAProblem(NamedTuple):
    cams: jnp.ndarray       # (V, 6) angle-axis (3) + translation (3)
    points: jnp.ndarray     # (N, 3)
    focal: jnp.ndarray      # scalar
    uv: jnp.ndarray         # (N, V, 2) pixel coords with principal point subtracted
    mask: jnp.ndarray       # (N, V) bool observation grid
    cam_valid: jnp.ndarray  # (V,) bool registered cameras
    pt_valid: jnp.ndarray   # (N,) bool live map points
    # Shared principal-point correction, refined only in refine_pp mode
    # (SSBA FULL_BUNDLE_FOCAL_LENGTH_PP parity, BundleAdjuster.cpp:219).
    pp_delta: jnp.ndarray | None = None


class BASummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def _residual_one(cam: jnp.ndarray, X: jnp.ndarray, focal: jnp.ndarray, uv: jnp.ndarray,
                  pp_delta: jnp.ndarray | None = None):
    """The reference BA residual (SfMBundleAdjustmentUtils.cpp:58-97):
    angle-axis rotate, translate, perspective divide, scale by shared focal;
    principal point already subtracted from uv. pp_delta is the shared
    principal-point correction (zero in modern-Ceres-parity mode)."""
    p = camera.rotate_angle_axis(cam[:3], X) + cam[3:]
    z = p[2]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    proj = p[:2] / zsafe * focal
    if pp_delta is not None:
        proj = proj + pp_delta
    return proj - uv


def _residuals_and_jacobians(prob: BAProblem):
    """Dense-grid residuals + Jacobians, masked.

    Returns r (N,V,2), Jc (N,V,2,6), Jp (N,V,2,3), Jg (N,V,2,3), w (N,V).
    Jg stacks the shared-intrinsics Jacobian columns [focal, ppx, ppy];
    d r / d pp is the 2x2 identity analytically (residual is affine in
    pp_delta), so only the focal column needs autodiff.
    """

    def one(cam, X, uv):
        f = lambda c, x, fo: _residual_one(c, x, fo, uv, prob.pp_delta)
        r = f(cam, X, prob.focal)
        Jc, Jp, Jf = jax.jacfwd(f, argnums=(0, 1, 2))(cam, X, prob.focal)
        return r, Jc, Jp, Jf

    over_v = jax.vmap(one, in_axes=(0, None, 0))        # over views
    over_n = jax.vmap(over_v, in_axes=(None, 0, 0))     # over points
    r, Jc, Jp, Jf = over_n(prob.cams, prob.points, prob.uv)
    Jpp = jnp.broadcast_to(jnp.eye(2, dtype=r.dtype), r.shape[:2] + (2, 2))
    Jg = jnp.concatenate([Jf[..., None], Jpp], axis=-1)
    w = (prob.mask & prob.pt_valid[:, None] & prob.cam_valid[None, :]).astype(r.dtype)
    return r, Jc, Jp, Jg, w


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse via adjugate (no LU on tiny blocks)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def _huber_weight(rnorm: jnp.ndarray, scale: float) -> jnp.ndarray:
    """IRLS weight of the Huber loss: 1 inside the scale, scale/|r| outside."""
    return jnp.minimum(1.0, scale / jnp.maximum(rnorm, 1e-12))


def _robust_cost(r: jnp.ndarray, w: jnp.ndarray, loss: str, loss_scale: float):
    """0.5 * sum of rho(|r|) over weighted observations.

    loss="trivial" is the reference's plain squared error (Ceres NULL
    loss, SfMBundleAdjustmentUtils.cpp:160); "huber" is the standard
    Ceres HuberLoss option for outlier-laden scenes.
    """
    r2 = jnp.sum(r * r, axis=-1)
    if loss == "huber":
        rn = jnp.sqrt(jnp.maximum(r2, 1e-24))
        rho = jnp.where(rn <= loss_scale, r2,
                        loss_scale * (2.0 * rn - loss_scale))
    else:
        rho = r2
    return 0.5 * jnp.sum(w * rho)


def _cost_only(cams, points, focal, prob: BAProblem, axis_name: str | None = None,
               pp_delta: jnp.ndarray | None = None, loss: str = "trivial",
               loss_scale: float = 0.0) -> jnp.ndarray:
    def one(cam, X, uv):
        return _residual_one(cam, X, focal, uv, pp_delta)

    r = jax.vmap(jax.vmap(one, in_axes=(0, None, 0)), in_axes=(None, 0, 0))(
        cams, points, prob.uv
    )
    w = (prob.mask & prob.pt_valid[:, None] & prob.cam_valid[None, :]).astype(r.dtype)
    c = _robust_cost(r, w, loss, loss_scale)
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    return c


def _cg_solve(A: jnp.ndarray, b: jnp.ndarray, extra_iters: int = 8,
              max_iters: int = 32) -> jnp.ndarray:
    """Conjugate gradients for an SPD (Jacobi-prescaled) system.

    Iteration count min(n + extra, max_iters): CG is exact in n steps in
    exact arithmetic, but the Jacobi-rescaled DAMPED system's spectrum is
    clustered, so a capped inexact solve converges to well below the LM
    accept/reject noise floor — and every CG step is a serial dependency
    (~3 tiny VPU ops each), so the cap directly bounds the per-LM-iteration
    latency on TPU. A too-inexact step is harmless: LM rejects it and
    raises lambda. fori_loop keeps it one fused XLA loop with no host sync.
    """
    n = b.shape[0]

    def body(_, state):
        x, r, p, rs = state
        Ap = A @ p
        denom = jnp.dot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rs / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.dot(r, r)
        beta = jnp.where(rs > 1e-30, rs_new / rs, 0.0)
        p = r + beta * p
        return (x, r, p, rs_new)

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.dot(b, b))
    x, _, _, _ = jax.lax.fori_loop(0, min(n + extra_iters, max_iters), body, state)
    return x


def _lm_step(prob: BAProblem, lam: jnp.ndarray, share_focal: bool,
             refine_pp: bool = False, axis_name: str | None = None):
    """One damped normal-equation solve.
    Returns (d_cams, d_points, d_focal, d_pp).

    The shared-intrinsics block g = [focal, ppx, ppy] is 3-wide; ppx/ppy
    columns are frozen unless refine_pp (legacy SSBA's
    FULL_BUNDLE_FOCAL_LENGTH_PP mode, BundleAdjuster.cpp:219).

    With ``axis_name`` set (inside a shard_map whose shards split the point
    axis N), this is the distributed Schur solve of SURVEY.md §2.3: every
    device reduces its local observations into the (6V+3) camera+intrinsics
    system, a single psum over ICI forms the global reduced system, the
    dense solve is replicated, and point back-substitution stays local —
    no per-point communication at all.
    """
    r, Jc, Jp, Jg, w = _residuals_and_jacobians(prob)
    V = prob.cams.shape[0]
    G = 3

    wJc = Jc * w[..., None, None]
    wJp = Jp * w[..., None, None]
    wJg = Jg * w[..., None, None]

    # Camera (+intrinsics) blocks of H and g
    U = jnp.einsum("nvia,nvib->vab", wJc, Jc)          # (V,6,6)
    U_cg = jnp.einsum("nvia,nvig->vag", wJc, Jg)        # (V,6,G)
    U_gg = jnp.einsum("nvig,nvih->gh", wJg, Jg)         # (G,G)
    b_c = jnp.einsum("nvia,nvi->va", wJc, r)            # (V,6)
    b_g = jnp.einsum("nvig,nvi->g", wJg, r)             # (G,)

    # Point blocks
    C = jnp.einsum("nvia,nvib->nab", wJp, Jp)           # (N,3,3)
    b_p = jnp.einsum("nvia,nvi->na", wJp, r)            # (N,3)

    # Camera-point and intrinsics-point couplings
    Kb = jnp.einsum("nvia,nvib->nvab", wJc, Jp)         # (N,V,6,3)
    Wg = jnp.einsum("nvig,nvia->nag", wJg, Jp)          # (N,3,G)

    if axis_name is not None:
        # Observation-sharded: camera-side reductions span all shards.
        # (Point blocks C/b_p/Kb/Wg are local — each point lives wholly on
        # one shard.) Damping and the Schur cross terms are linear in these
        # per-shard sums, so a single fused psum here is exact.
        U, U_cg, U_gg, b_c, b_g = jax.lax.psum((U, U_cg, U_gg, b_c, b_g), axis_name)

    # Ceres-style multiplicative damping on the diagonals
    eye6 = jnp.eye(6, dtype=U.dtype)
    eye3 = jnp.eye(3, dtype=C.dtype)
    eyeG = jnp.eye(G, dtype=U.dtype)
    Ud = U + lam * (U * eye6) + 1e-8 * eye6
    Cd = C + lam * (C * eye3) + 1e-8 * eye3
    Uggd = U_gg + lam * (U_gg * eyeG) + 1e-8 * eyeG

    Cinv = _inv3x3(Cd)

    # Schur complement of the point blocks: cross terms are per-point sums,
    # local to each shard; psum them before combining with the (already
    # global) camera blocks.
    KC = jnp.einsum("nvab,nbc->nvac", Kb, Cinv)         # (N,V,6,3)
    X_cc = jnp.einsum("nvac,nwbc->vawb", KC, Kb)        # (V,6,V,6) cross terms
    X_cg = jnp.einsum("nvac,ncg->vag", KC, Wg)          # (V,6,G)
    WgC = jnp.einsum("nag,nab->nbg", Wg, Cinv)          # (N,3,G)
    X_gg = jnp.einsum("nbg,nbh->gh", WgC, Wg)           # (G,G)
    X_c = jnp.einsum("nvac,nc->va", KC, b_p)
    X_g = jnp.einsum("nbg,nb->g", WgC, b_p)
    if axis_name is not None:
        X_cc, X_cg, X_gg, X_c, X_g = jax.lax.psum(
            (X_cc, X_cg, X_gg, X_c, X_g), axis_name
        )
    S_cc = -X_cc
    S_cc = S_cc.at[jnp.arange(V), :, jnp.arange(V), :].add(Ud)
    S_cg = U_cg - X_cg
    S_gg = Uggd - X_gg
    rhs_c = b_c - X_c
    rhs_g = b_g - X_g

    # Assemble the reduced (6V+G) system; mask unregistered cameras and
    # frozen intrinsic columns to identity
    n = 6 * V + G
    S = jnp.zeros((n, n), U.dtype)
    S = S.at[: 6 * V, : 6 * V].set(S_cc.reshape(6 * V, 6 * V))
    S = S.at[: 6 * V, 6 * V :].set(S_cg.reshape(6 * V, G))
    S = S.at[6 * V :, : 6 * V].set(S_cg.reshape(6 * V, G).T)
    S = S.at[6 * V :, 6 * V :].set(S_gg)
    rhs = jnp.concatenate([rhs_c.reshape(-1), rhs_g])

    cam_free = jnp.repeat(prob.cam_valid, 6)
    g_free = jnp.array([bool(share_focal), bool(refine_pp), bool(refine_pp)])
    free = jnp.concatenate([cam_free, g_free]).astype(U.dtype)
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    rhs = rhs * free

    # gradient + damping diagonals, for the trust-region gain ratio
    grad_c, grad_p, grad_g = b_c, b_p, b_g
    damp_c = lam * jnp.einsum("vaa->va", U)
    damp_p = lam * jnp.einsum("naa->na", C)
    damp_g = lam * jnp.diag(U_gg)

    # Jacobi rescale for f32 conditioning, then CG on the scaled SPD system.
    # (jnp.linalg.solve would LU-factor on the TPU's emulated path — slow
    # scalar row ops; CG is pure matvecs on the VPU/MXU and exact within
    # n iterations for this damped SPD system.)
    dscale = 1.0 / jnp.sqrt(jnp.clip(jnp.diag(S), 1e-12, None))
    Ss = S * dscale[:, None] * dscale[None, :]
    ys = _cg_solve(Ss, rhs * dscale)
    delta = ys * dscale
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

    d_cams = delta[: 6 * V].reshape(V, 6)
    d_g = delta[6 * V :]

    # Back-substitute the point updates
    Kd = jnp.einsum("nvab,va->nb", Kb, d_cams)          # (N,3)
    d_points = jnp.einsum("nab,nb->na", Cinv, b_p - Kd - jnp.einsum("nag,g->na", Wg, d_g))
    d_points = jnp.where(prob.pt_valid[:, None], d_points, 0.0)
    d_points = jnp.where(jnp.isfinite(d_points), d_points, 0.0)

    # Predicted cost decrease of the damped Gauss-Newton step (the update
    # applied is x <- x - delta, so pred = 0.5 * delta^T (lam D delta + g)):
    # the denominator of the LM gain ratio rho used by the Nielsen/Ceres
    # trust-region damping schedule.
    pred_cam = 0.5 * (jnp.sum(d_cams * (damp_c * d_cams + grad_c))
                      + jnp.sum(d_g * (damp_g * d_g + grad_g)))
    pred_pt = 0.5 * jnp.sum(d_points * (damp_p * d_points + grad_p))
    if axis_name is not None:
        # camera/focal terms are replicated; the point term is shard-local
        pred_pt = jax.lax.psum(pred_pt, axis_name)
    return d_cams, d_points, d_g[0], d_g[1:], pred_cam + pred_pt


def lm_solve(
    prob: BAProblem,
    *,
    max_iterations: int = 50,
    function_tolerance: float = 1e-6,
    initial_lambda: float = 1e-3,
    share_focal: bool = True,
    refine_pp: bool = False,
    axis_name: str | None = None,
):
    """Levenberg-Marquardt driver (jit-friendly lax.while_loop).

    Accept/reject semantics mirror a trust-region LM: a step that lowers the
    cost is accepted and lambda shrinks; otherwise lambda grows and the step
    retries. Convergence = relative cost decrease below function_tolerance
    (Ceres function_tolerance role, SfMBundleAdjustmentUtils.cpp:174).
    refine_pp additionally optimizes a shared principal-point correction
    (legacy SSBA FULL_BUNDLE_FOCAL_LENGTH_PP, BundleAdjuster.cpp:219).
    """
    if prob.pp_delta is None:
        prob = prob._replace(pp_delta=jnp.zeros((2,), prob.cams.dtype))
    cost0 = _cost_only(prob.cams, prob.points, prob.focal, prob, axis_name,
                       pp_delta=prob.pp_delta)

    def cond(state):
        it, _, _, _, _, done, _ = state
        return (it < max_iterations) & ~done

    def body(state):
        it, p, lam, nu, cost, done, rejects = state
        d_cams, d_points, d_focal, d_pp, pred = _lm_step(
            p, lam, share_focal, refine_pp, axis_name)
        new_cams = p.cams - d_cams
        new_points = p.points - d_points
        new_focal = p.focal - d_focal
        new_pp = p.pp_delta - d_pp
        new_cost = _cost_only(new_cams, new_points, new_focal, p, axis_name,
                              pp_delta=new_pp)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        p2 = p._replace(
            cams=jnp.where(accept, new_cams, p.cams),
            points=jnp.where(accept, new_points, p.points),
            focal=jnp.where(accept, new_focal, p.focal),
            pp_delta=jnp.where(accept, new_pp, p.pp_delta),
        )
        # Nielsen/Ceres trust-region damping from the gain ratio rho =
        # actual/predicted decrease: a near-Gauss-Newton step (rho ~ 1)
        # collapses lambda fast (quadratic convergence region), a poor step
        # grows it geometrically — this is what lets the solver match
        # Ceres' ~10-30 iteration budget instead of creeping at /3 per step.
        rho = (cost - new_cost) / jnp.maximum(pred, _EPS)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam2 = jnp.where(accept,
                         jnp.maximum(lam * shrink, 1e-10),
                         jnp.minimum(lam * nu, 1e8))
        nu2 = jnp.where(accept, 2.0, jnp.minimum(nu * 2.0, 64.0))
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, _EPS)
        # Termination: Ceres-style function_tolerance on an accepted step,
        # OR a stall (consecutive rejected steps at ever-higher damping —
        # the trust region has collapsed to the f32 noise floor and more
        # iterations cannot improve the cost). The stall exit is what keeps
        # the warm-started incremental BA calls cheap: near the optimum the
        # solver spends a handful of iterations, not the full budget.
        rejects2 = jnp.where(accept, 0, rejects + 1)
        # the tolerance exit counts only for genuine trust-region steps
        # (rho > 0.5, i.e. lambda shrank): an accepted-but-heavily-damped
        # micro-step has a tiny relative decrease without being converged
        done2 = (accept & (rel < function_tolerance) & (rho > 0.5)) \
            | (rejects2 >= 5)
        cost2 = jnp.where(accept, new_cost, cost)
        return (it + 1, p2, lam2, nu2, cost2, done2, rejects2)

    it, pf, lam, nu, costf, done, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0), prob, jnp.array(initial_lambda, prob.cams.dtype),
                     jnp.asarray(2.0, prob.cams.dtype), cost0, jnp.array(False),
                     jnp.array(0)),
    )
    return pf, BASummary(initial_cost=cost0, final_cost=costf, iterations=it, converged=done)


def reprojection_rms(prob: BAProblem) -> jnp.ndarray:
    """Root-mean-square reprojection error (pixels) over valid observations."""

    def one(cam, X, uv):
        return _residual_one(cam, X, prob.focal, uv, prob.pp_delta)

    r = jax.vmap(jax.vmap(one, in_axes=(0, None, 0)), in_axes=(None, 0, 0))(
        prob.cams, prob.points, prob.uv
    )
    w = (prob.mask & prob.pt_valid[:, None] & prob.cam_valid[None, :]).astype(r.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sqrt(jnp.sum(w * jnp.sum(r * r, -1)) / n)


def adjust_bundle(
    poses_Rt: jnp.ndarray,       # (V, 3, 4)
    cam_valid: jnp.ndarray,      # (V,)
    points: jnp.ndarray,         # (N, 3)
    pt_valid: jnp.ndarray,       # (N,)
    uv: jnp.ndarray,             # (N, V, 2) raw pixel observations
    obs_mask: jnp.ndarray,       # (N, V)
    K: jnp.ndarray,              # (3, 3)
    *,
    max_iterations: int = 50,
    function_tolerance: float = 1e-6,
    initial_lambda: float = 1e-3,
    share_focal: bool = True,
    refine_pp: bool = False,
    dtype: str = "float32",
):
    """High-level BA matching the reference adjustBundle API
    (SfMBundleAdjustmentUtils.h:35-50): takes poses + cloud + observations
    + intrinsics, returns optimized (poses, points, K, summary).

    Principal point is subtracted up front (reference :152-153); the shared
    focal is optimized and written back to K (:188-189). Like the reference
    (:182-185), the caller should discard results when converged is False.
    refine_pp also optimizes the principal point and writes it back to K
    (legacy SSBA FULL_BUNDLE_FOCAL_LENGTH_PP, BundleAdjuster.cpp:219,267-296).
    dtype selects the solve precision ("float32" default; "bfloat16" trades
    accuracy for HBM bandwidth on very large grids) — outputs are always
    written back as float32.
    """
    dt = jnp.dtype(dtype)
    V = poses_Rt.shape[0]
    rvecs = camera.matrix_to_rodrigues_b(poses_Rt[:, :, :3].reshape(V, 3, 3))
    cams = jnp.concatenate([rvecs, poses_Rt[:, :, 3]], axis=1)
    pp = K[:2, 2]
    prob = BAProblem(
        cams=cams.astype(dt),
        points=points.astype(dt),
        focal=K[0, 0].astype(dt),
        uv=(uv - pp[None, None, :]).astype(dt),
        mask=obs_mask,
        cam_valid=cam_valid,
        pt_valid=pt_valid,
    )
    sol, summary = lm_solve(
        prob,
        max_iterations=max_iterations,
        function_tolerance=function_tolerance,
        initial_lambda=initial_lambda,
        share_focal=share_focal,
        refine_pp=refine_pp,
    )
    sol = jax.tree.map(lambda a: a.astype(jnp.float32) if a.dtype == dt else a, sol)
    R = camera.rodrigues_to_matrix_b(sol.cams[:, :3])
    out_Rt = jnp.concatenate([R, sol.cams[:, 3:, None]], axis=2)
    newK = K.at[0, 0].set(sol.focal).at[1, 1].set(sol.focal)
    if refine_pp:
        newK = newK.at[:2, 2].set(pp + sol.pp_delta)
    return out_Rt, sol.points, newK, summary
