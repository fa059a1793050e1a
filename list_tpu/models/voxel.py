"""3D voxel encoder and SDF decoder head (flax, channels-last NDHWC).

VoxelEncoder2 (reference: network/modules.py:401-442), layer spec
[1,1,1,1,16,32,64,128,128]:
- l<2:  conv3x3x3 + ReLU + BN
- l==2: conv + **sigmoid** -> this 1-channel 128^3 map is features[0] and
  doubles as the refined occupancy prediction used by the occ loss.
- l>2:  conv + ReLU, conv + ReLU, BN, collect feature, maxpool(2)
Multi-scale features: [1@128^3, 16@128^3, 32@64^3, 64@32^3, 128@16^3, 128@8^3].

VoxelDecoder2 (reference: network/modules.py:192-282): per query point, 7
displaced samples (center +- 0.0722 per axis), trilinear border-padded
align-corners sampling of all 6 scales (369 ch x 7 = 2583), concat perceptual
features (1024) + xyz (3) = 3610-d, then a 1x1-conv MLP
3610 -> 2*h -> h -> h -> 1 with ReLU (h=256 -> hidden dims 512/256/256).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from list_tpu.models.init import make_torch_bias, torch_linear_kernel
from list_tpu.ops.sampling import grid_sample_3d


def _bn(train: bool, name: str, axis: int = -1):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name, axis=axis)


class _Conv3(nn.Module):
    """3x3x3 SAME conv, param-compatible with nn.Conv (params: kernel
    (3,3,3,I,O) + bias (O,)), with two layouts:

    - channels-last (B, D, H, W, C): plain lax conv (what nn.Conv does).
    - channel-major (B, C, D, H, W): the Pallas stencil kernel (TPU) or the
      shift-and-add XLA formulation (CPU) — see ops/pallas/stencil3d.py for
      why (XLA pads NDHWC conv buffers 8-128x at 1-16 channels; measured
      41 GB for the batch-8 train step).
    """
    features: int
    in_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cmajor: bool = False) -> jnp.ndarray:
        kernel = self.param('kernel', torch_linear_kernel,
                            (3, 3, 3, self.in_ch, self.features))
        bias = self.param('bias', make_torch_bias(self.in_ch * 27),
                          (self.features,))
        if cmajor:
            import jax
            from list_tpu.ops.pallas.stencil3d import (conv3x3x3_cmajor,
                                                       conv3x3x3_cmajor_xla)
            if jax.devices()[0].platform == 'cpu':
                y = conv3x3x3_cmajor_xla(x, kernel)
            else:
                y = conv3x3x3_cmajor(x, kernel)
            return y + bias[None, :, None, None, None]
        import jax
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return y + bias


def _maxpool2_cmajor(x: jnp.ndarray) -> jnp.ndarray:
    """2x2x2 max pool on (B, C, D, H, W) as three pairwise maxes.

    The single reshape-to-(...,2,...,2,...,2)-and-reduce formulation makes
    XLA materialize its backward mask in a channels-minor layout (8x lane
    padding -> an 8 GB buffer at batch 8); per-axis pairwise maxes keep
    every intermediate in the natural (H, W)-minor layout."""
    x = jnp.maximum(x[..., ::2], x[..., 1::2])          # W
    x = jnp.maximum(x[..., ::2, :], x[..., 1::2, :])    # H
    x = jnp.maximum(x[:, :, ::2], x[:, :, 1::2])        # D
    return x


class VoxelEncoder2(nn.Module):
    """Multi-scale 3D CNN (reference: network/modules.py:401-442).

    cmajor=True runs the full-resolution stage (spatial W == 128) in
    channel-major layout and hands back to channels-last after the first
    maxpool; numerics are identical (tests/test_models.py).
    """
    layers: Sequence[int] = (1, 1, 1, 1, 16, 32, 64, 128, 128)
    cmajor: bool = False
    # dtype of fold-packed training features; bf16 halves the pack-
    # transpose copy that XLA materializes lane-padded (None = keep f32).
    packed_dtype: Optional[str] = 'bfloat16'
    # Scale indices emitted corner-COLLAPSED (ops.sampling.collapse_corners):
    # one gathered row per displacement tap instead of 8 corner rows, at
    # ~4x that scale's feature bytes, built once per step here (outside the
    # decode chunk loop).  Empty = plain fold-packed everywhere.
    collapse_set: Sequence[int] = ()
    # Scale indices collapsed in 'halo' mode (x window only, 4 rows/tap,
    # ~+19% bytes — for scales whose full-collapse volume is too big).
    collapse_halo: Sequence[int] = ()

    @nn.compact
    def __call__(self, occ: jnp.ndarray, train: bool = False,
                 packed: bool = False):
        # occ: (B, R, R, R) -> features list (channels-last), or with
        # packed=True -> (packed features, metas) in the lane-dense fold
        # layout of ops.sampling.pack_channels_last (training path).
        from list_tpu.ops.sampling import (collapse_corners,
                                           pack_channels_last, pack_cmajor)

        cm = bool(self.cmajor) and occ.shape[-1] == 128
        net = occ[:, None] if cm else occ[..., None]
        features = []
        metas = []

        pdt = jnp.dtype(self.packed_dtype) if self.packed_dtype else None

        def collect(f, is_cm):
            if packed:
                p, meta = (pack_cmajor(f, pdt) if is_cm
                           else pack_channels_last(f, pdt))
                if len(features) in self.collapse_set:
                    p = collapse_corners(p, meta)
                elif len(features) in self.collapse_halo:
                    p = collapse_corners(p, meta, 'halo')
                features.append(p)
                metas.append(meta)
            else:
                features.append(jnp.moveaxis(f, 1, -1) if is_cm else f)

        L = list(self.layers)
        occ_pred = None
        for l in range(len(L) - 1):
            conv = _Conv3(L[l + 1], L[l], name=f'conv_{l}')
            if l < 2:
                net = nn.relu(conv(net, cm))
                net = _bn(train, f'bn_{l}', axis=1 if cm else -1)(net)
            elif l == 2:
                net = nn.sigmoid(conv(net, cm))
                # The occ loss consumes this map in f32; capture it before
                # the (possibly bf16) fold-pack so the loss/gradient never
                # see packed-dtype rounding of the sigmoid probabilities.
                occ_pred = (net[:, 0] if cm else net[..., 0]).astype(
                    jnp.float32)
                collect(net, cm)
            else:
                net = nn.relu(conv(net, cm))
                net = nn.relu(_Conv3(L[l + 1], L[l + 1],
                                     name=f'conv_{l}_0')(net, cm))
                net = _bn(train, f'bn_{l}', axis=1 if cm else -1)(net)
                collect(net, cm)
                if cm:
                    net = _maxpool2_cmajor(net)
                    # hand back to channels-last below full resolution
                    net = jnp.moveaxis(net, 1, -1)
                    cm = False
                else:
                    net = nn.max_pool(net, (2, 2, 2), strides=(2, 2, 2))
        if packed:
            return features, metas, occ_pred
        return features


def make_displacements(delta: float = 0.0722) -> np.ndarray:
    """(7, 3): center, then +-delta on each axis in the reference's order
    (modules.py:205-214)."""
    disp = [[0.0, 0.0, 0.0]]
    for ax in range(3):
        for s in (-1.0, 1.0):
            d = [0.0, 0.0, 0.0]
            d[ax] = s * delta
            disp.append(d)
    return np.asarray(disp, np.float32)


def sample_multiscale(feat: Sequence[jnp.ndarray], p: jnp.ndarray,
                      delta: float = 0.0722) -> jnp.ndarray:
    """Displaced multi-scale trilinear feature gather.

    feat: list of (B, D, H, W, Ci); p: (B, N, 3) normalized coords.
    Returns (B, N, sum(Ci)*7) ordered channel-major (c*7 + d), matching the
    reference's reshape of (B, C, 7, N) -> (B, C*7, N) (modules.py:270-273).
    """
    B, N, _ = p.shape
    disp = jnp.asarray(make_displacements(delta), p.dtype)  # (7, 3)
    pd = p[:, None, :, :] + disp[None, :, None, :]  # (B, 7, N, 3)
    pd = pd.reshape(B, 7 * N, 3)
    outs = []
    for f in feat:
        s = grid_sample_3d(f, pd, padding_mode='border', align_corners=True)
        s = s.reshape(B, 7, N, f.shape[-1])
        outs.append(jnp.transpose(s, (0, 2, 3, 1)))  # (B, N, C, 7)
    out = jnp.concatenate(outs, axis=2)  # (B, N, 369, 7)
    return out.reshape(B, N, -1)


class _Fc0PermDense(nn.Module):
    """fc_0 with the kernel rows gathered through a static permutation.

    Param tree, shapes and initializer draws are IDENTICAL to
    ``nn.Dense(features, name='fc_0')`` (same path -> same init RNG), so
    checkpoints are interchangeable; only the apply gathers kernel rows:
    ``y = x_natural @ kernel[perm] + bias`` == the reference-ordered
    ``x_ref @ kernel + bias``.  Permuting the (3610, 512) WEIGHT is how
    --fc0_dmajor avoids relaying the ~700 MB sampled-feature stack."""
    features: int
    perm: Optional[tuple] = None  # natural input pos -> reference row

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.param('kernel', torch_linear_kernel,
                       (x.shape[-1], self.features))
        b = self.param('bias', make_torch_bias(x.shape[-1]),
                       (self.features,))
        if self.perm is not None:
            k = jnp.take(k, jnp.asarray(np.asarray(self.perm)), axis=0)
        return x @ k + b


class VoxelDecoder2(nn.Module):
    """SDF head. Returns (B, N) raw SDF values (in sdf_scale units)."""
    h_dim: int = 256
    delta: float = 0.0722
    # --fuse_sample_gathers: scales per fused gather op in the packed
    # training sampler (0/1 = per-scale takes).
    fuse_gather: int = 0
    # --collapse_samples: scale indices arriving corner-collapsed from the
    # encoder (must match VoxelEncoder2.collapse_set / collapse_halo).
    collapse_set: Sequence[int] = ()
    collapse_halo: Sequence[int] = ()
    # --collapse_select: bf16 0/1-select + f32-lerp extraction (in-step
    # A/B of r5 lead #1; exact select, different f32 association).
    collapse_select: bool = False
    # --fc0_dmajor: tap-minor packed sampling (no per-scale output
    # transposes) + fc_0 kernel-row permutation (ops/sampling.py
    # fc0_dmajor_perm).  Exact; training packed path only.
    fc0_dmajor: bool = False

    @nn.compact
    def __call__(self, p: jnp.ndarray, feat: Sequence[jnp.ndarray],
                 percep_feat: jnp.ndarray, vox_meta=None) -> jnp.ndarray:
        # p: (B, N, 3); percep_feat: (B, N, 1024).  vox_meta: fold-pack
        # metadata when ``feat`` is in the lane-dense training layout.
        dmajor = bool(self.fc0_dmajor) and vox_meta is not None
        if vox_meta is not None:
            from list_tpu.ops.sampling import sample_multiscale_packed
            vox = sample_multiscale_packed(
                feat, vox_meta, p, self.delta,
                fuse_group=self.fuse_gather,
                collapse_set=self.collapse_set,
                collapse_halo=self.collapse_halo,
                collapse_select=self.collapse_select,
                dmajor=dmajor)
        else:
            vox = sample_multiscale(feat, p, self.delta)
        # Named for the selective decode-remat policy
        # (--remat_save_samples): saving the sampled stack lets the remat
        # backward skip the forward re-gathers (the 6-scale gather fleet)
        # while everything else still rematerializes.  checkpoint_name is
        # an identity outside jax.checkpoint.
        from jax.ad_checkpoint import checkpoint_name
        vox = checkpoint_name(vox, 'decode_vox')
        percep_feat = checkpoint_name(percep_feat, 'decode_percep')
        x = jnp.concatenate([vox, percep_feat, p], axis=-1)
        dims = [self.h_dim * 2, self.h_dim, self.h_dim]
        names = ['fc_0', 'fc_1', 'fc_2']
        perm = None
        if dmajor:
            from list_tpu.ops.sampling import fc0_dmajor_perm
            n_vox = vox.shape[-1]
            perm = np.concatenate([
                fc0_dmajor_perm([m[3] for m in vox_meta]),
                np.arange(n_vox, x.shape[-1], dtype=np.int64)])
            assert perm.shape[0] == x.shape[-1]
        for dim, name in zip(dims, names):
            if name == 'fc_0' and perm is not None:
                x = nn.relu(_Fc0PermDense(dim, perm=tuple(perm.tolist()),
                                          name='fc_0')(x))
                continue
            x = nn.relu(nn.Dense(dim, kernel_init=torch_linear_kernel,
                                 bias_init=make_torch_bias(x.shape[-1]),
                                 name=name)(x))
        x = nn.Dense(1, kernel_init=torch_linear_kernel,
                     bias_init=make_torch_bias(x.shape[-1]), name='fc_out')(x)
        return x[..., 0]
