"""Model/dataset/executor plug-in registry.

The reference resolves model, dataset, and executor classes at runtime from
dotted strings (reference: utils.py:20-26, train.py:124,134,242) and derives
the executor name by string substitution ``config.model.replace('model',
'executor')`` (train.py:242).  We keep that API shape — the driver stays
generic — but route through an explicit registry and translate reference
dotted paths so the reference's exact CLI commands work against this package.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

# Reference dotted path -> native dotted path.
_ALIASES: Dict[str, str] = {
    'network.models.CoarseNet': 'list_tpu.models.CoarseNet',
    'network.models.LIST': 'list_tpu.models.LIST',
    'network.executors.CoarseNet': 'list_tpu.train.executors.CoarseNetExecutor',
    'network.executors.LIST': 'list_tpu.train.executors.LISTExecutor',
    'datasets.Datasets.IM2PointFarthest': 'list_tpu.data.IM2PointFarthest',
    'datasets.Datasets.IM2SDF': 'list_tpu.data.IM2SDF',
    'datasets.Datasets.Pix3D': 'list_tpu.data.Pix3D',
    'datasets.Datasets.Synthetic': 'list_tpu.data.SyntheticSDFDataset',
    # Short names for convenience.
    'CoarseNet': 'list_tpu.models.CoarseNet',
    'LIST': 'list_tpu.models.LIST',
    'IM2PointFarthest': 'list_tpu.data.IM2PointFarthest',
    'IM2SDF': 'list_tpu.data.IM2SDF',
    'Pix3D': 'list_tpu.data.Pix3D',
    'Synthetic': 'list_tpu.data.SyntheticSDFDataset',
}


def resolve(kls: str) -> str:
    return _ALIASES.get(kls, kls)


def get_class(kls: str) -> Any:
    """Import and return the class named by dotted path ``kls``.

    Accepts reference-style paths (``network.models.LIST``) and native ones
    (``list_tpu.models.LIST``).
    """
    kls = resolve(kls)
    module_name, _, attr = kls.rpartition('.')
    if not module_name:
        raise ValueError(f'Expected dotted path, got {kls!r}')
    m = importlib.import_module(module_name)
    return getattr(m, attr)


def executor_for(model_path: str) -> str:
    """Derive the executor path from the model path.

    Mirrors the reference's ``config.model.replace('model', 'executor')``
    idiom (train.py:242, test.py:95) while working for both naming schemes.
    """
    model_path = resolve(model_path)
    if model_path.startswith('list_tpu.models.'):
        name = model_path.rsplit('.', 1)[1]
        return f'list_tpu.train.executors.{name}Executor'
    return model_path.replace('model', 'executor')


def register_alias(name: str, target: str) -> None:
    """Register an extra dotted-path alias (for user plug-ins)."""
    _ALIASES[name] = target
