"""SE(3) pose-graph optimization for loop closure.

The TPU-frontend counterpart of ORB-SLAM3's essential-graph optimization
(reference: ORB-SLAM3/src/Optimizer.cc OptimizeEssentialGraph, invoked by
LoopClosing.cc after a loop is verified): keyframe poses along the
anchor->current chain are refined so that (a) consecutive relative poses
stay near their odometry estimates and (b) the loop constraint between the
anchor region and the current keyframe is satisfied. Where the reference
runs g2o Levenberg-Marquardt over Sim3 vertices, this runs a dense
Gauss-Newton over SE(3) right-perturbations in numpy — chains are a few
hundred keyframes at most, so the 6K x 6K normal equations are trivial on
the host (the hot path stays on the TPU; this is episodic CPU work like
the rest of the tracking frontend).

Conventions: poses are camera-to-world 4x4 (P = Twc). A constraint
(i, j, M, w) says P_i^-1 @ P_j should equal M, weighted w. Residual
r = log(M^-1 (P_i^-1 P_j)) in se(3); Jacobians are computed numerically
(central differences) — exact enough for GN at these scales and immune to
adjoint bookkeeping errors.
"""
from __future__ import annotations

import numpy as np


def _hat(w: np.ndarray) -> np.ndarray:
    return np.array([[0.0, -w[2], w[1]],
                     [w[2], 0.0, -w[0]],
                     [-w[1], w[0], 0.0]], dtype=np.float64)


def se3_exp(xi: np.ndarray) -> np.ndarray:
    """xi = (omega, v) -> 4x4 via the closed-form SE(3) exponential."""
    w, v = np.asarray(xi[:3], np.float64), np.asarray(xi[3:], np.float64)
    th = np.linalg.norm(w)
    W = _hat(w)
    if th < 1e-10:
        R = np.eye(3) + W
        V = np.eye(3) + 0.5 * W
    else:
        A = np.sin(th) / th
        B = (1.0 - np.cos(th)) / (th * th)
        C = (1.0 - A) / (th * th)
        R = np.eye(3) + A * W + B * (W @ W)
        V = np.eye(3) + B * W + C * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def se3_log(T: np.ndarray) -> np.ndarray:
    """4x4 -> (omega, v). Safe across the whole rotation range including
    theta ~ pi (where the sin-based axis extraction degenerates)."""
    R = np.asarray(T[:3, :3], np.float64)
    t = np.asarray(T[:3, 3], np.float64)
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-10:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]]) * 0.5
        Vinv = np.eye(3) - 0.5 * _hat(w)
        return np.concatenate([w, Vinv @ t])
    if th > np.pi - 1e-4:
        # near pi: (R + I)/2 ~ a a^T + cos-term; take the axis from the
        # largest diagonal of (M - c I)/(1 - c), sign from the skew part
        # R_sym = c I + (1-c) a a^T  =>  a a^T = (M - c I)/(1 - c)
        M = 0.5 * (R + R.T)
        aa = np.clip(np.diag(M) - c, 0.0, None) / (1.0 - c)
        k = int(np.argmax(aa))
        a = np.empty(3)
        a[k] = np.sqrt(max(aa[k], 1e-16))
        for m in range(3):
            if m != k:
                a[m] = M[k, m] / ((1.0 - c) * a[k])
        a /= max(np.linalg.norm(a), 1e-12)
        skew = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]])
        if float(skew @ a) < 0.0:
            a = -a
        w = th * a
    else:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]]) * (th / (2.0 * np.sin(th)))
    W = _hat(w)
    # V^-1 = I - W/2 + (1 - A/(2B)) / th^2 * W^2 with A = sin(th)/th,
    # B = (1-cos th)/th^2 — finite at th = pi (limit 1/pi^2)
    A = np.sin(th) / th
    B = (1.0 - np.cos(th)) / (th * th)
    coef = (1.0 - A / (2.0 * B)) / (th * th)
    Vinv = np.eye(3) - 0.5 * W + coef * (W @ W)
    return np.concatenate([w, Vinv @ t])


def _adjoint(T: np.ndarray) -> np.ndarray:
    """6x6 SE(3) adjoint for the (omega, v) twist ordering."""
    R = np.asarray(T[:3, :3], np.float64)
    t = np.asarray(T[:3, 3], np.float64)
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[3:, 3:] = R
    A[3:, :3] = _hat(t) @ R
    return A


def _residual(Pi: np.ndarray, Pj: np.ndarray, Minv: np.ndarray
              ) -> np.ndarray:
    return se3_log(Minv @ (np.linalg.inv(Pi) @ Pj))


def _solve_normal(H: np.ndarray, b: np.ndarray, constraints: list,
                  col: dict) -> np.ndarray:
    """Solve the GN normal equations. Loop-closure graphs are a keyframe
    CHAIN plus edges into the fixed anchor, so H is block-tridiagonal
    (half-bandwidth 11 scalars) — solve it banded in O(K) instead of the
    dense O(K^3), which stalls the online tracking thread seconds per
    loop closure on long chains. Any edge that couples two free poses
    more than one chain step apart breaks the band; fall back to dense.
    """
    n = H.shape[0]
    banded = all(
        abs(col[i] - col[j]) <= 6
        for (i, j, _, _) in constraints if i in col and j in col)
    if not banded or n <= 36:
        return np.linalg.solve(H, b)
    from scipy.linalg import solve_banded
    lo = hi = 11
    ab = np.zeros((lo + hi + 1, n))
    for d in range(-lo, hi + 1):
        diag = np.diagonal(H, offset=d)
        ab[hi - d, max(d, 0):max(d, 0) + diag.shape[0]] = diag
    return solve_banded((lo, hi), ab, b)


def optimize_pose_graph(poses: np.ndarray,
                        constraints: list,
                        fixed: set | frozenset = frozenset({0}),
                        iters: int = 8,
                        damping: float = 1e-8) -> np.ndarray:
    """Gauss-Newton over SE(3) poses.

    poses: [K, 4, 4] camera-to-world initial estimates.
    constraints: list of (i, j, M [4,4], weight) with M ~ P_i^-1 P_j.
    fixed: pose indices held constant (gauge anchor).
    Returns optimized [K, 4, 4]; falls back to the inputs if the solve
    goes non-finite (degenerate graph / near-pi pathologies).

    Jacobians use the standard small-residual right-perturbation
    linearization (Jr^{-1}(r) ~ I): d r / d delta_j = I,
    d r / d delta_i = -Ad(P_j^-1 P_i) — the g2o-style approximation,
    exact in the limit of converged residuals.
    """
    P0 = np.stack([np.asarray(p, np.float64) for p in poses])
    P = [p.copy() for p in P0]
    K = len(P)
    free = [k for k in range(K) if k not in fixed]
    col = {k: 6 * n for n, k in enumerate(free)}
    n_var = 6 * len(free)
    if n_var == 0 or not constraints:
        return P0.astype(np.float32)
    Minvs = [np.linalg.inv(np.asarray(M, np.float64))
             for (_, _, M, _) in constraints]
    I6 = np.eye(6)

    for _ in range(iters):
        H = np.zeros((n_var, n_var))
        b = np.zeros(n_var)
        for (ci, (i, j, _, w)) in enumerate(constraints):
            r = _residual(P[i], P[j], Minvs[ci])
            if not np.isfinite(r).all():
                continue
            blocks = {}
            if j in col:
                blocks[j] = I6
            if i in col:
                blocks[i] = -_adjoint(np.linalg.inv(P[j]) @ P[i])
            for k1, J1 in blocks.items():
                c1 = col[k1]
                b[c1:c1 + 6] -= w * (J1.T @ r)
                for k2, J2 in blocks.items():
                    c2 = col[k2]
                    H[c1:c1 + 6, c2:c2 + 6] += w * (J1.T @ J2)
        H[np.diag_indices_from(H)] += damping * (1.0 + np.diag(H))
        try:
            delta = _solve_normal(H, b, constraints, col)
        except np.linalg.LinAlgError:
            break
        if not np.isfinite(delta).all():
            break
        for k in free:
            c = col[k]
            P[k] = P[k] @ se3_exp(delta[c:c + 6])
        if float(np.abs(delta).max()) < 1e-9:
            break
    out = np.stack(P)
    if not np.isfinite(out).all():
        return P0.astype(np.float32)
    return out.astype(np.float32)


def chain_constraints(poses: np.ndarray, weight: float = 1.0) -> list:
    """Odometry constraints between consecutive poses from their current
    estimates (the essential graph's spanning-tree edges)."""
    out = []
    for k in range(len(poses) - 1):
        M = np.linalg.inv(np.asarray(poses[k], np.float64)) @ \
            np.asarray(poses[k + 1], np.float64)
        out.append((k, k + 1, M, weight))
    return out
