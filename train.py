#!/usr/bin/env python3
"""Training CLI — reference-compatible entry point.

  python3 train.py --model network.models.CoarseNet \
      --dataset datasets.Datasets.IM2PointFarthest --color_jitter --normalize ...
  python3 train.py --model network.models.LIST \
      --dataset datasets.Datasets.IM2SDF --sample_distribution 0.45 0.44 0.1 \
      --sdf_scale 10 --warm_start ...

Reference dotted paths are translated by list_tpu.registry; native paths
(list_tpu.models.LIST) work too (reference driver: train.py:305-325).
"""

import os

from list_tpu.config import get_args
from list_tpu.train.trainer import train
from list_tpu.utils.logging import snapshot_experiment

if __name__ == '__main__':
    config = get_args()
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    snapshot_experiment(config)
    train(config)
