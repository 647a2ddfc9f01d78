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
    """4x4 -> (omega, v)."""
    R = np.asarray(T[:3, :3], np.float64)
    t = np.asarray(T[:3, 3], np.float64)
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-10:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]]) * 0.5
        Vinv = np.eye(3) - 0.5 * _hat(w)
    else:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]]) * (th / (2.0 * np.sin(th)))
        W = _hat(w)
        # V^-1 = I - W/2 + (1/th^2 - (1+cos th)/(2 th sin th)) W^2
        coef = 1.0 / (th * th) - (1.0 + np.cos(th)) / \
            (2.0 * th * np.sin(th))
        Vinv = np.eye(3) - 0.5 * W + coef * (W @ W)
    return np.concatenate([w, Vinv @ t])


def _residual(Pi: np.ndarray, Pj: np.ndarray, Minv: np.ndarray
              ) -> np.ndarray:
    return se3_log(Minv @ (np.linalg.inv(Pi) @ Pj))


def optimize_pose_graph(poses: np.ndarray,
                        constraints: list,
                        fixed: set | frozenset = frozenset({0}),
                        iters: int = 8,
                        damping: float = 1e-8,
                        eps: float = 1e-5) -> np.ndarray:
    """Gauss-Newton over SE(3) poses.

    poses: [K, 4, 4] camera-to-world initial estimates.
    constraints: list of (i, j, M [4,4], weight) with M ~ P_i^-1 P_j.
    fixed: pose indices held constant (gauge anchor).
    Returns optimized [K, 4, 4].
    """
    P = [np.asarray(p, np.float64).copy() for p in poses]
    K = len(P)
    free = [k for k in range(K) if k not in fixed]
    col = {k: 6 * n for n, k in enumerate(free)}
    n_var = 6 * len(free)
    if n_var == 0 or not constraints:
        return np.stack(P).astype(np.float32)
    Minvs = [np.linalg.inv(np.asarray(M, np.float64))
             for (_, _, M, _) in constraints]

    for _ in range(iters):
        H = np.zeros((n_var, n_var))
        b = np.zeros(n_var)
        cost = 0.0
        for (ci, (i, j, _, w)) in enumerate(constraints):
            Minv = Minvs[ci]
            r = _residual(P[i], P[j], Minv)
            cost += w * float(r @ r)
            blocks = {}
            for (k, sign) in ((i, -1.0), (j, 1.0)):
                if k in col:
                    Jk = np.zeros((6, 6))
                    for d in range(6):
                        dx = np.zeros(6)
                        dx[d] = eps
                        Pp = P[k] @ se3_exp(dx)
                        Pm = P[k] @ se3_exp(-dx)
                        if k == i:
                            rp = _residual(Pp, P[j], Minv)
                            rm = _residual(Pm, P[j], Minv)
                        else:
                            rp = _residual(P[i], Pp, Minv)
                            rm = _residual(P[i], Pm, Minv)
                        Jk[:, d] = (rp - rm) / (2.0 * eps)
                    blocks[k] = Jk
            for k1, J1 in blocks.items():
                c1 = col[k1]
                b[c1:c1 + 6] -= w * (J1.T @ r)
                for k2, J2 in blocks.items():
                    c2 = col[k2]
                    H[c1:c1 + 6, c2:c2 + 6] += w * (J1.T @ J2)
        H[np.diag_indices_from(H)] += damping * (1.0 + np.diag(H))
        try:
            delta = np.linalg.solve(H, b)
        except np.linalg.LinAlgError:
            break
        for k in free:
            c = col[k]
            P[k] = P[k] @ se3_exp(delta[c:c + 6])
        if float(np.abs(delta).max()) < 1e-9:
            break
    return np.stack(P).astype(np.float32)


def chain_constraints(poses: np.ndarray, weight: float = 1.0) -> list:
    """Odometry constraints between consecutive poses from their current
    estimates (the essential graph's spanning-tree edges)."""
    out = []
    for k in range(len(poses) - 1):
        M = np.linalg.inv(np.asarray(poses[k], np.float64)) @ \
            np.asarray(poses[k + 1], np.float64)
        out.append((k, k + 1, M, weight))
    return out
