#!/usr/bin/env python3
"""Produce the pretrained-ResNet18 weights artifact for ``--resnet_ckpt``.

The reference initializes both image encoders from ImageNet-pretrained
torchvision ResNet18 (reference: network/modules.py:1030); paper-parity
accuracy is unreachable from random init.  This container has no egress and
no torchvision, so the artifact must be produced ONCE on any machine with
internet access and copied in:

    python tools/make_resnet_npz.py --out resnet18_imagenet.npz

then train with ``--resnet_ckpt resnet18_imagenet.npz``: the trainer splices
the weights into both ``im_encoder`` and ``im_encoder2`` (the reference
loads the same IME weights into both, train.py:187-210) via
``list_tpu.utils.torch_port.apply_resnet_ckpt``.

Provenance pinning: torchvision's ResNet18_Weights.IMAGENET1K_V1 file is
``resnet18-f37072fd.pth`` — the name embeds the first 8 sha256 hex digits
(f37072fd), which this script verifies after download.  The conv1 weights
are re-initialized downstream regardless (the reference replaces conv1 with
a fresh stride-1 7x7 conv, modules.py:1032-1033).

Output format: an .npz of the plain torch state_dict (key -> float32
array), which torch_port.load_state_dict_file reads without torch.
"""

import argparse
import hashlib

EXPECTED_SHA256_PREFIX = 'f37072fd'
URL = 'https://download.pytorch.org/models/resnet18-f37072fd.pth'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='resnet18_imagenet.npz')
    ap.add_argument('--pth', default=None,
                    help='use an already-downloaded resnet18-f37072fd.pth '
                         'instead of fetching')
    args = ap.parse_args()

    import numpy as np
    import torch

    if args.pth:
        path = args.pth
    else:
        from torch.hub import download_url_to_file
        path = '/tmp/resnet18-f37072fd.pth'
        download_url_to_file(URL, path)

    digest = hashlib.sha256(open(path, 'rb').read()).hexdigest()
    assert digest.startswith(EXPECTED_SHA256_PREFIX), (
        f'sha256 {digest} does not match torchvision pin '
        f'{EXPECTED_SHA256_PREFIX}*')

    sd = torch.load(path, map_location='cpu', weights_only=True)
    arrays = {k: np.asarray(v.detach().cpu(), np.float32)
              for k, v in sd.items()}
    np.savez(args.out, **arrays)
    print(f'wrote {args.out}: {len(arrays)} tensors, '
          f'sha256(source)={digest[:16]}...')


if __name__ == '__main__':
    main()
