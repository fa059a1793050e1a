#!/usr/bin/env python3
"""Offline batch mesh evaluation CLI (see list_tpu/eval/offline.py)."""
from list_tpu.eval.offline import evaluate_main

if __name__ == '__main__':
    evaluate_main()
