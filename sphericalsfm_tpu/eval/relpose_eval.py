"""Relative-pose accuracy evaluation between two COLMAP models.

Capability parity with the reference's PhoneSweep evaluator
(/root/reference/scripts/evaluate_sfm_relative.py + scripts/metric.py):
intersect predicted and ground-truth models by image name, compute all-pairs
relative rotation / translation angular errors, report Racc/Tacc@{5,15,30},
AUC@30, and mean relative focal error. Reimplemented on numpy/jnp with no
PyTorch3D dependency — the metric definitions match (camera_to_rel_deg,
calculate_auc; metric.py:14-78).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from ..io.colmap import ColmapModel, quat_to_rotmat, read_colmap_model
from .metrics import auc_at


def _poses_by_name(model: ColmapModel) -> Dict[str, tuple]:
    out = {}
    for img in model.images.values():
        R = quat_to_rotmat(img["q"])
        out[img["name"]] = (R, img["t"], img["camera_id"])
    return out


def _focal_of(model: ColmapModel, camera_id: int) -> float:
    return float(model.cameras[camera_id]["params"][0])


def relative_pose_errors(pred: ColmapModel, gt: ColmapModel):
    """All-pairs relative rotation/translation angular errors (degrees) over
    the images present in both models. Returns (rot_err (M,), trans_err (M,),
    focal_rel_err)."""
    p = _poses_by_name(pred)
    g = _poses_by_name(gt)
    names = sorted(set(p) & set(g))
    if len(names) < 2:
        raise ValueError(f"only {len(names)} common images")

    Rp = np.stack([p[n][0] for n in names])
    tp = np.stack([p[n][1] for n in names])
    Rg = np.stack([g[n][0] for n in names])
    tg = np.stack([g[n][1] for n in names])

    n = len(names)
    iu, ju = np.triu_indices(n, k=1)

    # relative pose j<-i: R_rel = R_j R_iᵀ, t_rel = t_j − R_rel t_i
    def rel(R, t):
        Rrel = np.einsum("pij,pkj->pik", R[ju], R[iu])
        trel = t[ju] - np.einsum("pij,pj->pi", Rrel, t[iu])
        return Rrel, trel

    Rrp, trp = rel(Rp, tp)
    Rrg, trg = rel(Rg, tg)

    cycle = np.einsum("pij,pkj->pik", Rrp, Rrg)
    cos_r = np.clip((np.trace(cycle, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot_err = np.degrees(np.arccos(cos_r))

    def norm(v):
        n_ = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n_, 1e-12)

    cos_t = np.clip(np.sum(norm(trp) * norm(trg), axis=-1), -1, 1)
    trans_err = np.degrees(np.arccos(cos_t))

    f_pred = _focal_of(pred, p[names[0]][2])
    f_gt = _focal_of(gt, g[names[0]][2])
    focal_rel_err = abs(f_pred - f_gt) / f_gt
    return rot_err, trans_err, focal_rel_err


def evaluate_models(pred_dir: str, gt_dir: str) -> dict:
    """Full report for one sequence (reference evaluate_sfm_relative.py
    output: Racc/Tacc@{5,15,30} in %, AUC@30 in %, focal err in %)."""
    pred = read_colmap_model(pred_dir)
    gt = read_colmap_model(gt_dir)
    rot_err, trans_err, focal_err = relative_pose_errors(pred, gt)

    report = {"num_pairs": int(len(rot_err)), "focal_rel_err_pct": 100 * focal_err}
    for tau in (5, 15, 30):
        report[f"Racc@{tau}"] = 100.0 * float((rot_err < tau).mean())
        report[f"Tacc@{tau}"] = 100.0 * float((trans_err < tau).mean())
    both = np.maximum(rot_err, trans_err)
    report["AUC@30"] = 100.0 * float(auc_at(jnp.asarray(both), 30.0, 30))
    return report
