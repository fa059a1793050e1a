#!/usr/bin/env python3
"""Full test-split inference + evaluation CLI (reference: test.py:165-167)."""

from list_tpu.config import get_args
from list_tpu.infer.pipeline import test_all

if __name__ == '__main__':
    config = get_args()
    test_all(config)
