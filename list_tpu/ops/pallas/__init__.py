"""Pallas TPU kernels for the hot SDF-decode path.

Production kernel (wired to --use_pallas): fused_fc0.fused_fc0_mlp — the
dense-grid decoder head (fc_0 accumulation + ReLU MLP tail) with VMEM-
resident activations.

Experimental (NOT wired into any production path):
- dense_decode: a fully-fused variant that also does the x-lerp in-kernel;
  parity-green but slower than the XLA dense path on v5e (round-1 finding:
  Mosaic dynamic-row VMEM slicing per tap dominates) — kept as a study.
"""

from list_tpu.ops.pallas.fused_fc0 import fused_fc0_mlp  # noqa: F401
