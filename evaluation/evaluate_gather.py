#!/usr/bin/env python3
"""Aggregate per-shape eval pickles into mean/median + CSV."""
from list_tpu.eval.offline import gather_main

if __name__ == '__main__':
    gather_main()
