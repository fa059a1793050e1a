"""Evaluation metrics with exact reference numerics.

- ``eval_pointcloud`` (reference: evaluation/eval_util.py:54-141):
  completeness (gt->pred) / accuracy (pred->gt) nearest distances,
  chamfer_l2 = (0.5*mean(c^2) + 0.5*mean(a^2)) * 10000, precision/recall/
  F-score at thresholds {0.005, 0.01, 0.05} (note: the reference normalizes
  BOTH precision and recall by len(pointcloud_pred) — preserved), optional
  normal consistency.
- ``eval_mesh`` (reference: evaluation/eval_util.py:23-51): 100k surface
  samples per mesh -> eval_pointcloud; IoU from 1M uniform bbox samples via
  implicit waterproofing.
- ``implicit_waterproofing`` (reference: evaluation/implicit_waterproofing.py
  :31-52): parity ray-stab with up-to-3 rotation retries for hole points.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from list_tpu import native
from list_tpu.utils.meshio import Mesh

THRESHOLDS = (0.005, 0.01, 0.05)


def distance_p2p(points_src: np.ndarray, points_tgt: np.ndarray,
                 normals_src: Optional[np.ndarray] = None,
                 normals_tgt: Optional[np.ndarray] = None):
    """Nearest distance of each src point to tgt (eval_util.py:144-170)."""
    dist, idx = native.nn_distances(points_src, points_tgt, return_index=True)
    if normals_src is None:
        return dist, None
    normals_src = normals_src / np.linalg.norm(normals_src, axis=-1,
                                               keepdims=True)
    normals_tgt = normals_tgt / np.linalg.norm(normals_tgt, axis=-1,
                                               keepdims=True)
    dot = np.abs((normals_tgt[idx] * normals_src).sum(axis=-1))
    return dist, dot


def eval_pointcloud(pointcloud_pred: np.ndarray, pointcloud_gt: np.ndarray,
                    normals_pred: Optional[np.ndarray] = None,
                    normals_gt: Optional[np.ndarray] = None
                    ) -> Dict[str, float]:
    pointcloud_pred = np.asarray(pointcloud_pred)
    pointcloud_gt = np.asarray(pointcloud_gt)

    completeness, completeness_normals = distance_p2p(
        pointcloud_gt, pointcloud_pred, normals_gt, normals_pred)
    completeness2 = completeness ** 2

    precision = {}
    for p in THRESHOLDS:
        precision['precision_' + str(p * 100)] = (
            len(completeness[completeness < p]) / len(pointcloud_pred))

    completeness_m = completeness.mean()
    completeness2_m = completeness2.mean()

    accuracy, accuracy_normals = distance_p2p(
        pointcloud_pred, pointcloud_gt, normals_pred, normals_gt)
    accuracy2 = accuracy ** 2

    recall = {}
    for p in THRESHOLDS:
        recall['recall_' + str(p * 100)] = (
            len(accuracy[accuracy < p]) / len(pointcloud_pred))

    accuracy_m = accuracy.mean()
    accuracy2_m = accuracy2.mean()

    chamfer_l2 = (0.5 * completeness2_m + 0.5 * accuracy2_m) * 10000

    fscore = {}
    for p in THRESHOLDS:
        key = str(p * 100)
        fscore['fscore_' + key] = (
            2 * precision['precision_' + key] * recall['recall_' + key]
            / (precision['precision_' + key] + recall['recall_' + key] + 1e-5))

    out = {
        'completeness': float(completeness_m),
        'accuracy': float(accuracy_m),
        'completeness2': float(completeness2_m),
        'accuracy2': float(accuracy2_m),
        'chamfer_l2': float(chamfer_l2),
    }
    if normals_pred is not None:
        out['normals_completeness'] = float(completeness_normals.mean())
        out['normals_accuracy'] = float(accuracy_normals.mean())
        out['normals'] = float(0.5 * completeness_normals.mean()
                               + 0.5 * accuracy_normals.mean())
    out.update({k: float(v) for k, v in precision.items()})
    out.update({k: float(v) for k, v in recall.items()})
    out.update({k: float(v) for k, v in fscore.items()})
    return out


def _rotation_matrix(euler_angles) -> np.ndarray:
    rx, ry, rz = euler_angles
    R_x = np.array([[1, 0, 0],
                    [0, math.cos(rx), -math.sin(rx)],
                    [0, math.sin(rx), math.cos(rx)]])
    R_y = np.array([[math.cos(ry), 0, math.sin(ry)],
                    [0, 1, 0],
                    [-math.sin(ry), 0, math.cos(ry)]])
    R_z = np.array([[math.cos(rz), -math.sin(rz), 0],
                    [math.sin(rz), math.cos(rz), 0],
                    [0, 0, 1]])
    return R_z @ R_y @ R_x


def check_mesh_contains(mesh: Mesh, points: np.ndarray,
                        hash_resolution: int = 512):
    return native.inside_mesh(mesh.triangles, points, hash_resolution)


def implicit_waterproofing(mesh_source: Mesh, query_points: np.ndarray):
    """Robust inside/outside with rotation retries on disagreeing rays."""
    occ_list, holes_list = check_mesh_contains(mesh_source, query_points)

    for euler_angles in np.array([[0, np.pi / 2, 0], [np.pi / 2, 0, 0],
                                  [0, 0, np.pi / 2]]):
        if not holes_list.any():
            break
        r = _rotation_matrix(euler_angles)
        mesh = mesh_source.copy()
        r4 = np.pad(r, [(0, 1), (0, 1)], 'constant')
        mesh.apply_transform(r4)
        points = (r @ query_points[holes_list].T).T
        occ_rot, holes_rot = check_mesh_contains(mesh, points)
        occ_list[holes_list] = occ_rot
        holes_updated = np.full(len(query_points), False)
        holes_updated[holes_list] = holes_rot
        holes_list = holes_updated
    return occ_list, holes_list


def eval_mesh(mesh_pred: Mesh, mesh_gt: Mesh, bb_min: float, bb_max: float,
              n_points: int = 100000,
              rng: Optional[np.random.RandomState] = None) -> Dict[str, float]:
    if len(mesh_pred.vertices) < 10:
        print('Pred mesh has no data. Exiting evaluation.')
        return {}
    pointcloud_pred = mesh_pred.sample(n_points, rng=rng).astype(np.float32)
    pointcloud_gt = mesh_gt.sample(n_points, rng=rng).astype(np.float32)
    out = eval_pointcloud(pointcloud_pred, pointcloud_gt)

    bb_len = bb_max - bb_min
    sampler = rng if rng is not None else np.random
    bb_samples = sampler.rand(n_points * 10, 3) * bb_len + bb_min
    occ_pred = implicit_waterproofing(mesh_pred, bb_samples)[0]
    occ_gt = implicit_waterproofing(mesh_gt, bb_samples)[0]
    area_union = (occ_pred | occ_gt).astype(np.float32).sum()
    area_intersect = (occ_pred & occ_gt).astype(np.float32).sum()
    out['iou'] = float(area_intersect / area_union) if area_union > 0 else float('nan')
    return out
