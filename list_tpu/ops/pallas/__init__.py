"""Pallas TPU kernels for the hot SDF-decode path.

Production kernel (wired to --use_pallas): fused_fc0.fused_fc0_mlp — the
dense-grid decoder head (fc_0 accumulation + ReLU MLP tail) with VMEM-
resident activations.

(The round-1 experimental dense_decode and mlp kernels were pruned in
round 3: superseded by fused_fc0 + the coarse-projected XLA restructure in
ops/dense_grid.py.)
"""

from list_tpu.ops.pallas.fused_fc0 import fused_fc0_mlp  # noqa: F401
