"""Pallas TPU kernels for the hot SDF-decode path."""

from list_tpu.ops.pallas.mlp import fused_sdf_mlp, sdf_mlp_reference  # noqa: F401
