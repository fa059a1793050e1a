#!/usr/bin/env python3
"""Offline SDF-sampling CLI (see list_tpu/data/preprocess.py)."""
from list_tpu.data.preprocess import main

if __name__ == '__main__':
    main()
