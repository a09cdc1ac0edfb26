"""Trajectory evaluation: ATE-RMSE with SE3/Sim3 alignment + the reference's
benchmark statistics protocol.

Implements the metric protocol of the reference's evaluation harness
(reference: Scripts/evaluate_ate.py — Horn alignment + RMSE of translational
differences; Benchmarking/generate_results.py:16,40-57 — median-of-N-runs
with a 5% tracking-lost gate). Re-derived from the published TUM protocol,
vectorized numpy.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (or similarity) alignment dst ~= s R src + t.

    Returns (s, R, t).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_xyz: np.ndarray, gt_xyz: np.ndarray, align: bool = True,
             with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after optional alignment
    (reference protocol: Scripts/evaluate_ate.py align + RMSE)."""
    if align:
        s, R, t = umeyama_alignment(est_xyz, gt_xyz, with_scale)
        est_xyz = (s * (R @ est_xyz.T)).T + t
    err = np.linalg.norm(est_xyz - gt_xyz, axis=-1)
    return float(np.sqrt((err ** 2).mean()))


def benchmark_statistics(run_rmses: list[float], lost_fracs: list[float],
                         lost_gate: float = 0.05, max_failed: int = 2):
    """Median-of-runs aggregation with the reference's lost-frame gate
    (reference: Benchmarking/generate_results.py:16,40-57 — runs with >5%
    lost frames discarded; >2 discarded runs ⇒ sequence failed)."""
    keep = [r for r, l in zip(run_rmses, lost_fracs) if l <= lost_gate]
    failed = len(run_rmses) - len(keep)
    if failed > max_failed or not keep:
        return {"failed": True, "median_rmse": float("nan"),
                "sigma": float("nan"), "discarded": failed}
    arr = np.asarray(keep)
    return {"failed": False, "median_rmse": float(np.median(arr)),
            "sigma": float(arr.std()), "discarded": failed}
