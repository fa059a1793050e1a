"""Checkpoint families with reference semantics.

The reference keeps (SURVEY.md §5):
- periodic ``model_<N>.pt.tar`` (train.py:255-257)
- ``best_model_train.pt.tar`` (train.py:259-262)
- ``best_model_test.pt.tar`` (selection metric 1-IoU, else chamfer_l2;
  train.py:270-288)
- submodule checkpoints ``best_IME_test`` / ``best_PD_test`` split out of
  CoarseNet and loaded for warm start with freezing (README.md:88-100,
  train.py:183-229).

Files are msgpack via flax.serialization (single-file, atomic-rename), named
``*.ckpt``.  Payload mirrors the reference dict: {epoch, state_dict
(params+batch_stats), optimizer, bestloss}.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_state_dict(tree) -> Any:
    """Canonical nested-dict state (handles optax namedtuple/tuple states)."""
    return jax.tree.map(np.asarray, serialization.to_state_dict(tree))


def save_checkpoint(epoch: int, state, bestloss: float, path: str,
                    include_opt: bool = True) -> None:
    payload = {
        'epoch': int(epoch) + 1,
        'state_dict': {
            'params': _to_state_dict(state.params),
            'batch_stats': _to_state_dict(state.batch_stats),
        },
        'optimizer': (_to_state_dict(state.opt_state) if include_opt
                      else None),
        'bestloss': float(bestloss),
        'step': int(state.step),
    }
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, state, restore_opt: bool = True
                    ) -> Tuple[int, Any, float]:
    """Restore params/batch_stats (and optimizer) into ``state``; returns
    (epoch, new_state, bestloss)."""
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(state.params,
                                           payload['state_dict']['params'])
    batch_stats = serialization.from_state_dict(
        state.batch_stats, payload['state_dict']['batch_stats'])
    new_state = state.replace(params=params, batch_stats=batch_stats,
                              step=int(payload.get('step', 0)))
    if restore_opt and payload.get('optimizer') is not None:
        opt_state = serialization.from_state_dict(state.opt_state,
                                                  payload['optimizer'])
        new_state = new_state.replace(opt_state=opt_state)
    bestloss = float(payload.get('bestloss', 1e7))
    return int(payload['epoch']), new_state, bestloss


def save_submodule(epoch: int, state, name: str, path: str) -> None:
    """Split a top-level submodule's params+stats into its own checkpoint
    (the best_IME_test/best_PD_test recipe, models.py:115-127)."""
    payload = {
        'epoch': int(epoch),
        'state_dict': {
            'params': _to_state_dict(state.params[name]),
            'batch_stats': _to_state_dict(
                state.batch_stats[name]
                if name in state.batch_stats else {}),
        },
    }
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))


def load_submodule(path: str, state, name: str):
    """Partial restore of one top-level submodule (warm start,
    train.py:183-216)."""
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    params = dict(state.params)
    params[name] = serialization.from_state_dict(
        state.params[name], payload['state_dict']['params'])
    batch_stats = dict(state.batch_stats)
    if name in batch_stats and payload['state_dict']['batch_stats']:
        batch_stats[name] = serialization.from_state_dict(
            state.batch_stats[name], payload['state_dict']['batch_stats'])
    return state.replace(params=params, batch_stats=batch_stats)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path)
