"""Offline evaluate/gather CLI tests (reference: evaluation/evaluate.py,
evaluate_gather.py)."""

import os
import pickle

import numpy as np

from list_tpu.eval.offline import evaluate_main, gather_main
from list_tpu.utils.meshio import make_icosphere


def test_evaluate_and_gather(tmp_path):
    gen = tmp_path / 'gen'
    gt = tmp_path / 'gt'
    for i, r in enumerate((0.3, 0.35)):
        shape = f'shape{i}'
        (gen / '03001627' / shape).mkdir(parents=True)
        (gt / '03001627' / shape).mkdir(parents=True)
        make_icosphere(2, r).export(
            str(gen / '03001627' / shape / '00_pred.obj'))
        make_icosphere(2, r * 1.05).export(
            str(gt / '03001627' / shape / 'isosurf_scaled.obj'))

    n = evaluate_main(['--gen_dir', str(gen), '--mesh_dir', str(gt),
                       '--n_points', '2000'])
    assert n == 2
    eval_dir = str(gen / 'eval')
    pkls = [f for f in os.listdir(eval_dir) if f.endswith('.pkl')]
    assert len(pkls) == 2
    with open(os.path.join(eval_dir, pkls[0]), 'rb') as f:
        scores = pickle.load(f)
    assert 'chamfer_l2' in scores and 'iou' in scores
    assert scores['iou'] > 0.7

    csv_path = gather_main(['--eval_dir', eval_dir])
    assert os.path.exists(csv_path)
    assert os.path.exists(csv_path.replace('.csv', '_mean.pkl'))
    with open(csv_path) as f:
        content = f.read()
    assert 'Mean' in content and 'chamfer_l2' in content

    # idempotent re-run skips existing pkls
    n2 = evaluate_main(['--gen_dir', str(gen), '--mesh_dir', str(gt),
                        '--n_points', '2000'])
    assert n2 == 0
