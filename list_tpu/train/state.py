"""Train state and optimizer construction.

Optimizer parity (reference: train.py:142-145): torch Adam with lr=1e-4,
betas=(0.9, 0.999), weight_decay=1e-5.  Torch couples weight decay into the
gradient *before* the Adam moments, so the optax chain is
add_decayed_weights -> scale_by_adam -> scale(-lr) (NOT decoupled AdamW).

Warm-start freezing (reference: train.py:222-228): im_encoder and
point_decoder get zero updates via optax.multi_transform over a param-label
tree; im_encoder2 stays trainable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax
import jax
import optax
from flax import core


class TrainState(flax.struct.PyTreeNode):
    step: int
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state)

    @classmethod
    def create(cls, params, batch_stats, tx):
        # jit'd: eager optax init issues one zeros_like dispatch per leaf
        # (hundreds of axon-relay round trips); jitted it is one program.
        return cls(step=0, params=params, batch_stats=batch_stats,
                   opt_state=jax.jit(tx.init)(params), tx=tx)


def make_optimizer(lr: float, beta1: float = 0.9, beta2: float = 0.999,
                   weight_decay: float = 1e-5,
                   frozen_prefixes: Sequence[str] = ()
                   ) -> optax.GradientTransformation:
    """torch-Adam-parity optimizer, optionally freezing top-level submodules
    named in ``frozen_prefixes`` (e.g. ('im_encoder', 'point_decoder'))."""
    adam = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=beta1, b2=beta2),
        optax.scale(-lr),
    )
    if not frozen_prefixes:
        return adam

    def label_fn(params):
        def label_tree(prefix, tree):
            if isinstance(tree, dict):
                return {k: label_tree(k if prefix is None else prefix, v)
                        for k, v in tree.items()}
            return 'frozen' if prefix in frozen_prefixes else 'train'

        return {k: jax.tree.map(
            lambda _: 'frozen' if k in frozen_prefixes else 'train', v)
            for k, v in params.items()}

    return optax.multi_transform(
        {'train': adam, 'frozen': optax.set_to_zero()}, label_fn)


def split_variables(variables) -> Dict[str, Any]:
    params = variables['params']
    batch_stats = variables.get('batch_stats', core.freeze({}))
    return {'params': params, 'batch_stats': batch_stats}
