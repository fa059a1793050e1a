"""Split stage-1 CoarseNet submodule checkpoints for warm starting LIST.

The reference does this with a commented-out manual recipe
(network/models.py:115-127, mirrored in README.md:88-100): load the
CoarseNet ``best_model_test`` checkpoint and save its image encoder and
point decoder as ``best_IME_test`` / ``best_PD_test``.  CoarseNet names its
encoder ``image_encoder`` while LIST loads the same weights into
``im_encoder`` AND ``im_encoder2`` (train.py:187-210), so the IME checkpoint
is written under the ``im_encoder`` name.

Usage:
  python -m list_tpu.train.split_coarse --exp_name coarse_prediciton \
      [--checkpoint best_model_test.ckpt] [--output_dir ./results/]
"""

from __future__ import annotations

import argparse
import os

from flax import serialization


def split_coarse_checkpoint(checkpoint_path: str, out_dir: str) -> None:
    with open(checkpoint_path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    epoch = payload.get('epoch', 0)
    params = payload['state_dict']['params']
    stats = payload['state_dict'].get('batch_stats', {})

    def write(name_src: str, fname: str) -> None:
        sub = {
            'epoch': epoch,
            'state_dict': {
                'params': params[name_src],
                'batch_stats': stats.get(name_src, {}),
            },
        }
        path = os.path.join(out_dir, fname)
        with open(path, 'wb') as f:
            f.write(serialization.msgpack_serialize(sub))
        print('wrote', path)

    write('image_encoder', 'best_IME_test.ckpt')
    write('point_decoder', 'best_PD_test.ckpt')


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--exp_name', default='coarse_prediciton')
    p.add_argument('--output_dir', default='./results/')
    p.add_argument('--checkpoint', default='best_model_test.ckpt')
    args = p.parse_args(argv)
    ckpt_dir = os.path.join(args.output_dir, args.exp_name, 'checkpoints')
    split_coarse_checkpoint(os.path.join(ckpt_dir, args.checkpoint), ckpt_dir)


if __name__ == '__main__':
    main()
