"""Torch-CPU eager anchor of the reference per-chunk SDF decode.

Rebuilds the reference hot loop (network/executors.py:215-224 shapes:
65,536-point chunks through 6-scale x 7-displacement grid_sample + 1024-ch
perceptual grid_sample + Conv1d MLP 3610->512->256->256->1, fp32 eager) and
measures queries/sec plus achieved GEMM FLOP/s on this host, to calibrate
eager-mode efficiency for the BASELINE.md GPU bound.  First-party module
construction — nothing imported from /root/reference.
"""
import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)
N = 65536
CH = [1, 16, 32, 64, 128, 128]
RES = [128, 128, 64, 32, 16, 8]


def main():
    torch.set_num_threads(torch.get_num_threads())
    vols = [torch.randn(1, c, r, r, r) for c, r in zip(CH, RES)]
    pmaps = [torch.randn(1, c, 137, 137) for c in (64, 64, 128, 256, 512)]
    fc0 = nn.Conv1d(3610, 512, 1)
    fc1 = nn.Conv1d(512, 256, 1)
    fc2 = nn.Conv1d(256, 256, 1)
    fco = nn.Conv1d(256, 1, 1)
    disp = torch.zeros(7, 3)
    for i, (ax, s) in enumerate([(0, -1), (0, 1), (1, -1), (1, 1),
                                 (2, -1), (2, 1)]):
        disp[i + 1, ax] = s * 0.0722

    q = torch.rand(1, N, 3) * 2 - 1

    def chunk_decode(q):
        with torch.no_grad():
            pd = (q[:, None] + disp[None, :, None, :]).reshape(1, 1, 7 * N, 1, 3)
            feats = []
            for v in vols:
                s = F.grid_sample(v, pd, padding_mode='border',
                                  align_corners=True)  # (1, C, 1, 7N, 1)
                feats.append(s.reshape(1, -1, 7, N).reshape(1, -1, N))
            uv = q[..., :2].reshape(1, N, 1, 2)
            per = [F.grid_sample(p, uv, align_corners=True).reshape(1, -1, N)
                   for p in pmaps]
            x = torch.cat(feats + per + [q.transpose(1, 2)], dim=1)
            x = F.relu(fc0(x))
            x = F.relu(fc1(x))
            x = F.relu(fc2(x))
            return fco(x)

    chunk_decode(q)  # warm
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        chunk_decode(q)
    dt = (time.time() - t0) / reps
    qps = N / dt

    # pure-GEMM calibration: the fc stack alone as matmuls
    x = torch.randn(3610, N)
    w = torch.randn(512, 3610)
    torch.mm(w, x)
    t0 = time.time()
    for _ in range(reps):
        torch.mm(w, x)
    gemm_dt = (time.time() - t0) / reps
    gemm_flops = 2 * 512 * 3610 * N / gemm_dt

    flop_per_q = 2 * (3610 * 512 + 512 * 256 + 256 * 256 + 256)
    out = {
        'chunk_decode_s': round(dt, 3),
        'cpu_qps': round(qps, 1),
        'flop_per_query': flop_per_q,
        'decode_achieved_gflops': round(qps * flop_per_q / 1e9, 2),
        'gemm_achieved_gflops': round(gemm_flops / 1e9, 2),
        'eager_efficiency_vs_gemm': round(
            qps * flop_per_q / gemm_flops, 3),
        'torch_threads': torch.get_num_threads(),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
