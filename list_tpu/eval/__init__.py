"""Evaluation suite: Chamfer/F-score/IoU with reference numerics."""

from list_tpu.eval.metrics import (  # noqa: F401
    eval_mesh, eval_pointcloud, distance_p2p, implicit_waterproofing,
    check_mesh_contains, THRESHOLDS)
