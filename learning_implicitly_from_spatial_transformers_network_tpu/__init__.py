"""Alias package: the full project name re-exporting `list_tpu`.

The implementation lives in `list_tpu/` (models/ ops/ parallel/ data/ train/
infer/ eval/ native/ utils/); this module lets
`import learning_implicitly_from_spatial_transformers_network_tpu as list_tpu`
work for discoverability.
"""

import sys

import list_tpu
from list_tpu import *  # noqa: F401,F403
from list_tpu import (config, data, eval, infer, models, native, ops,  # noqa: F401
                      parallel, registry, train, utils)

for _name in ('config', 'data', 'eval', 'infer', 'models', 'native', 'ops',
              'parallel', 'registry', 'train', 'utils'):
    sys.modules[__name__ + '.' + _name] = getattr(list_tpu, _name)
