"""TreeGCN graph decoder (flax).

Behavioral spec from the reference:
- ``TreeGCN`` layer (layers/gcn.py:6-69): per-depth root linear maps summed
  over all ancestors (each ancestor feature broadcast to its descendants),
  learned branching ``W_branch`` (node -> degree*node upsample) followed by a
  2-layer no-bias ``W_loop`` (support=10), LeakyReLU(0.2); bias is added (and
  the activation applied) only when ``activation=True`` (gcn.py:65-66).
- ``TreeGraphDecoder`` (network/modules.py:107-132): 7 layers, features
  [128,128,256,256,256,128,128,3], degrees [2,2,2,2,2,2,64] -> 1 root node
  grows to 2^6*64 = 4096 points x 3 coords; the last layer has no activation.

The tree (list of per-depth node features) is threaded functionally instead
of mutated in place.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from list_tpu.models.init import (make_kaiming_normal_leaky, make_torch_bias,
                                  make_uniform_stdv, torch_linear_kernel)


class TreeGCN(nn.Module):
    depth: int
    features: Sequence[int]
    degrees: Sequence[int]
    support: int = 10
    node: int = 1
    upsample: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, tree: List[jnp.ndarray]) -> List[jnp.ndarray]:
        in_feat = self.features[self.depth]
        out_feat = self.features[self.depth + 1]
        degree = self.degrees[self.depth]
        batch = tree[-1].shape[0]

        root = 0.0
        for inx in range(self.depth + 1):
            root_num = tree[inx].shape[1]
            repeat_num = self.node // root_num
            root_node = nn.Dense(out_feat, use_bias=False,
                                 kernel_init=torch_linear_kernel,
                                 name=f'W_root_{inx}')(tree[inx])
            # torch repeat(1,1,r).view(B,-1,F): ancestor row maps to its
            # `repeat_num` consecutive descendants.
            root = root + jnp.tile(root_node, (1, 1, repeat_num)).reshape(
                batch, -1, out_feat)

        if self.upsample:
            w_branch = self.param(
                'W_branch',
                make_kaiming_normal_leaky(in_feat * degree * in_feat, a=0.2),
                (self.node, in_feat, degree * in_feat))
            branch = jnp.einsum('bni,nij->bnj', tree[-1], w_branch)
            branch = nn.leaky_relu(branch, 0.2)
            branch = branch.reshape(batch, self.node * degree, in_feat)
            branch = nn.Dense(in_feat * self.support, use_bias=False,
                              kernel_init=torch_linear_kernel,
                              name='W_loop_0')(branch)
            branch = nn.Dense(out_feat, use_bias=False,
                              kernel_init=torch_linear_kernel,
                              name='W_loop_1')(branch)
            root_rep = jnp.tile(root, (1, 1, degree)).reshape(
                batch, -1, out_feat)
            branch = root_rep + branch
        else:
            branch = nn.Dense(in_feat * self.support, use_bias=False,
                              kernel_init=torch_linear_kernel,
                              name='W_loop_0')(tree[-1])
            branch = nn.Dense(out_feat, use_bias=False,
                              kernel_init=torch_linear_kernel,
                              name='W_loop_1')(branch)
            branch = root + branch

        if self.activation:
            bias = self.param('bias',
                              make_uniform_stdv(1.0 / (out_feat ** 0.5)),
                              (1, degree, out_feat))
            branch = nn.leaky_relu(
                branch + jnp.tile(bias, (1, self.node, 1)), 0.2)
        return tree + [branch]


class TreeGraphDecoder(nn.Module):
    """Stack of TreeGCN layers; input is ``[featvec[:, None, :]]`` (a 1-node
    tree), output the final (B, prod(degrees), features[-1]) point set."""
    features: Sequence[int]
    degrees: Sequence[int]
    support: int = 10

    @nn.compact
    def __call__(self, tree: List[jnp.ndarray]) -> jnp.ndarray:
        layer_num = len(self.features) - 1
        assert layer_num == len(self.degrees), (
            'Number of features should be one more than number of degrees.')
        vertex_num = 1
        for inx in range(layer_num):
            tree = TreeGCN(depth=inx, features=tuple(self.features),
                           degrees=tuple(self.degrees), support=self.support,
                           node=vertex_num, upsample=True,
                           activation=(inx != layer_num - 1),
                           name=f'TreeGCN_{inx}')(tree)
            vertex_num *= self.degrees[inx]
        return tree[-1]
