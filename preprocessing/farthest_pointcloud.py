#!/usr/bin/env python3
"""Offline FPS CLI: JAX farthest-point sampling (replaces the reference's
pytorch3d CUDA op, preprocessing/farthest_pointcloud.py)."""
import argparse

from list_tpu.data.preprocess import run_fps

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--h5_dir', default='./Datasets/shapenet/sampled_points/')
    p.add_argument('--k', type=int, default=5000)
    args = p.parse_args()
    n = run_fps(args.h5_dir, args.k)
    print(f'FPS: processed {n} shapes')
