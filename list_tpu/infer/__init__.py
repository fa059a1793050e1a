"""Inference engine: dense-grid SDF evaluation + full-split pipeline."""

from list_tpu.infer.pipeline import test_all, test_one_without_gttransmat  # noqa: F401
