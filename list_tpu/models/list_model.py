"""The two LIST models (flax): CoarseNet (stage 1) and LIST (stage 2).

CoarseNet (reference: network/models.py:14-35): image -> ResEncoder global
feature (128) -> TreeGraphDecoder -> (B, 4096, 3) coarse point cloud.

LIST (reference: network/models.py:38-112): full single-view SDF model.
Differences by design (TPU-first):
- The coarse-cloud voxelization happens **in-jit** as a quantization scatter
  with stop_gradient (the reference does a device->host cKDTree round trip
  inside forward, models.py:102-112; gradients were blocked by pc.detach()).
- Channels-last layouts everywhere; images are (B, H, W, 3).
- ``encode``/``decode_sdf`` split out so chunked dense-grid inference can run
  the encoders once and stream query chunks (reference executor does this
  manually through model.module.*, executors.py:200-224).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from list_tpu.models.init import make_torch_bias, torch_linear_kernel
from list_tpu.models.percep import PerceptualPooling
from list_tpu.models.pointmlp import PointMLP
from list_tpu.models.resnet import ResEncoder
from list_tpu.models.treegcn import TreeGraphDecoder
from list_tpu.models.voxel import VoxelDecoder2, VoxelEncoder2
from list_tpu.ops.grid import reorder_and_scale_query, voxelize

DEFAULT_POINT_FEAT = (128, 128, 256, 256, 256, 128, 128, 3)
DEFAULT_POINT_DEGREE = (2, 2, 2, 2, 2, 2, 64)
DEFAULT_IM_ENC_LAYERS = (1, 1, 1, 1, 16, 32, 64, 128, 128)


def parse_collapse_samples(spec, batch_size: int) -> tuple:
    """--collapse_samples -> (full_indices, halo_indices) static tuples.
    A token like '1h' collapses that scale in 'halo' mode (x window only,
    4 rows/tap, ~+19%% bytes) instead of the full 4-quad replication.

    'auto' picks the set measured fastest on v5e (tools/
    ab_train_collapse.py full-step A/Bs, same chip session each):
    batch <= 4 -> full (0, 2, 3, 5) + halo 1: 1.201 vs 1.470 same-session
                  (collapse-off control 1.597);
    batch  > 4 -> full (0, 3, 5) + halo 1: 3.029 (vs 3.132 without halo,
                  4.100 collapse-off; the full set incl. 2 also fits the
                  remat'd batch-8 step but measured 3.212).
    'none'/'' disables; an explicit '0,3,5,1h' wins."""
    if isinstance(spec, (tuple, list)):
        # route through the token parser so programmatic ('0', '1h') specs
        # behave exactly like the CLI string form (ADVICE r4)
        spec = ','.join(str(s) for s in spec)
    spec = str(spec).strip().lower()
    if spec in ('none', ''):
        return (), ()
    if spec == 'auto':
        return (((0, 2, 3, 5), (1,)) if batch_size <= 4
                else ((0, 3, 5), (1,)))
    full, halo = [], []
    for t in spec.replace(' ', '').split(','):
        if not t:
            continue
        (halo if t.endswith('h') else full).append(int(t.rstrip('h')))
    return tuple(full), tuple(halo)


class CoarseNet(nn.Module):
    """Stage-1 coarse point-cloud predictor."""
    point_feat: Sequence[int] = DEFAULT_POINT_FEAT
    point_degree: Sequence[int] = DEFAULT_POINT_DEGREE
    support: int = 10

    @classmethod
    def from_config(cls, config) -> 'CoarseNet':
        return cls(point_feat=tuple(config.point_feat),
                   point_degree=tuple(config.point_degree))

    def setup(self):
        self.image_encoder = ResEncoder()
        self.point_decoder = TreeGraphDecoder(
            features=tuple(self.point_feat),
            degrees=tuple(self.point_degree), support=self.support)

    def __call__(self, rgba: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        featvec, _ = self.image_encoder(rgba, train)
        return self.point_decoder([featvec[:, None, :]])


class SpatialTransformer(nn.Module):
    """MLP 640 -> 128 -> 128 -> 12 with LeakyReLU(0.2)+BatchNorm1d, reshaped
    to a (B, 4, 3) learned camera projection (reference: models.py:60-68)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            x = nn.Dense(128, kernel_init=torch_linear_kernel,
                         bias_init=make_torch_bias(x.shape[-1]),
                         name=f'fc{i}')(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'bn{i}')(x)
        x = nn.Dense(12, kernel_init=torch_linear_kernel,
                     bias_init=make_torch_bias(x.shape[-1]), name='fc2')(x)
        return x.reshape(-1, 4, 3)


class LIST(nn.Module):
    """Stage-2 full model: image + query points -> (occ_pred, sdf)."""
    vox_res: int = 128
    bb_min: float = -0.5
    bb_max: float = 0.5
    point_feat: Sequence[int] = DEFAULT_POINT_FEAT
    point_degree: Sequence[int] = DEFAULT_POINT_DEGREE
    im_enc_layers: Sequence[int] = DEFAULT_IM_ENC_LAYERS
    h_dim: int = 256
    support: int = 10
    # Image-encoder width override — tiny multi-device dry runs / CI only;
    # None keeps the reference ResNet18 architecture.
    im_filters: Optional[Sequence[int]] = None
    # Rematerialize the 3D voxel encoder in the backward pass (--remat):
    # its multi-scale activations at batch 8 x 128^3 are the dominant HBM
    # residents of the train step; recomputing them trades ~5% step FLOPs
    # for several GB of live activation memory.
    remat: bool = False
    # dtype of the fold-packed training features (None = f32; bf16 halves
    # the pack-transpose copy XLA materializes lane-padded).
    vox_packed_dtype: Optional[str] = 'bfloat16'
    # Decode-chunk remat override: None follows ``remat``.  The decode
    # backward re-streams the whole 6-scale x 8-corner gather-index fleet
    # under remat, and the train step is index-streaming-bound (~34M
    # indices/s measured) — at batch 4 the chunk activations fit in HBM,
    # so skipping decode remat trades ~2.5 GB for a third of the index
    # traffic.  Batch 8 still needs it (250 MB headroom).
    remat_decode: Optional[bool] = None
    # --fuse_sample_gathers: scales per fused gather op in the packed
    # training sampler (the step is gather-latency bound; fewer, bigger
    # takes).  0 keeps the per-scale takes.
    fuse_gather: int = 0
    # --collapse_samples: scale indices whose training gather operand is
    # corner-collapsed (ops/sampling.py collapse_corners): one gathered row
    # per displacement tap instead of 8 corner rows, at ~4x those scales'
    # feature bytes (built once per step, outside the decode chunk loop).
    # Measured per-chunk f+b on v5e (tools/probe_corner_collapse.py):
    # 3.1x / 1.4x / 2.7x / 1.6x on scales 0/2/3/5; scale 1 (16ch@128^3)
    # LOSES (1.27 GB collapsed volume) and scale 4 is a wash.
    collapse_samples: Sequence[int] = ()
    collapse_samples_halo: Sequence[int] = ()
    # --collapse_select: extraction as bf16 0/1-select einsums + f32 lerp
    # instead of the f32-weight einsum (in-step A/B of the r4 trace's
    # layout-copy lead; ops/sampling.py _sample_collapsed_one).
    collapse_select: bool = False
    # --fc0_dmajor: tap-minor training sampler layout + fc_0 kernel-row
    # permutation — kills the per-scale (B,7,N,C)->(B,N,C,7) sample
    # relayouts by permuting the 3610x512 WEIGHT instead (exact).
    fc0_dmajor: bool = False
    # --remat_save_samples: under decode remat, SAVE the named sampled
    # stacks ('decode_vox', optionally 'decode_percep') instead of
    # recomputing them — the remat backward then skips the forward
    # re-gather fleet (measured ~0.6 s/step of the batch-8 backward scan)
    # at the cost of keeping ~340 MB (vox, bf16) + ~135 MB (percep, f32)
    # live per chunk.  0 = plain full remat; 1 = save vox; 2 = save
    # vox + percep.
    remat_save_samples: int = 0
    # Split the training query axis into this many rematerialized chunks:
    # the reference holds the full (B, 3610, N) first-layer activation live
    # (modules.py:276); at batch 8 x 32,441 queries that is ~3.8 GB f32 and
    # OOMs a 16 GB v5e with the rest of the step.  Chunking is numerically
    # exact (no cross-query ops in percep/decoder).  1 disables.
    train_query_chunks: int = 4

    @classmethod
    def from_config(cls, config) -> 'LIST':
        rd = int(getattr(config, 'remat_decode', -1))
        _cs = parse_collapse_samples(
            getattr(config, 'collapse_samples', 'none'),
            int(getattr(config, 'train_batch_size', 4)))
        return cls(vox_res=config.vox_res, bb_min=config.bb_min,
                   bb_max=config.bb_max, point_feat=tuple(config.point_feat),
                   point_degree=tuple(config.point_degree),
                   im_enc_layers=tuple(config.im_enc_layers),
                   remat=bool(getattr(config, 'remat', 0)),
                   remat_decode=(None if rd < 0 else bool(rd)),
                   fuse_gather=int(
                       getattr(config, 'fuse_sample_gathers', 0)),
                   collapse_samples=_cs[0], collapse_samples_halo=_cs[1],
                   collapse_select=bool(
                       int(getattr(config, 'collapse_select', 0))),
                   fc0_dmajor=bool(int(getattr(config, 'fc0_dmajor', 0))),
                   remat_save_samples=int(
                       getattr(config, 'remat_save_samples', 0)),
                   train_query_chunks=int(
                       getattr(config, 'train_query_chunks', 4)))

    def setup(self):
        # --remat: recompute voxel-encoder activations in backward instead
        # of keeping them live (train/packed stay static python bools).
        vox_cls = (nn.remat(VoxelEncoder2, static_argnums=(2, 3))
                   if self.remat else VoxelEncoder2)
        # cmajor: the full-resolution conv stage runs channel-major so its
        # activations aren't lane-padded 8-128x by XLA (stencil3d.py).
        self.vox_encoder = vox_cls(layers=tuple(self.im_enc_layers),
                                   cmajor=True,
                                   packed_dtype=self.vox_packed_dtype,
                                   collapse_set=tuple(self.collapse_samples),
                                   collapse_halo=tuple(
                                       self.collapse_samples_halo))
        self.sdf_decoder = VoxelDecoder2(h_dim=self.h_dim,
                                         fuse_gather=self.fuse_gather,
                                         collapse_set=tuple(
                                             self.collapse_samples),
                                         collapse_halo=tuple(
                                             self.collapse_samples_halo),
                                         collapse_select=bool(
                                             self.collapse_select),
                                         fc0_dmajor=bool(self.fc0_dmajor))
        self.percep_pooling = PerceptualPooling()
        enc_kw = ({} if self.im_filters is None
                  else dict(filters=tuple(self.im_filters),
                            fc_dim=max(self.im_filters)))
        self.im_encoder = ResEncoder(**enc_kw)
        self.im_encoder2 = ResEncoder(**enc_kw)
        self.point_decoder = TreeGraphDecoder(
            features=tuple(self.point_feat),
            degrees=tuple(self.point_degree), support=self.support)
        self.point_mlp_coarse = PointMLP()
        self.spatial_transformer = SpatialTransformer()

    def encode(self, img: jnp.ndarray, train: bool = False,
               trans_mat: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        """Run everything that is query-independent once per image."""
        feat_g, _ = self.im_encoder(img, train)
        feat_g2, feat_l2 = self.im_encoder2(img, train)
        pc = self.point_decoder([feat_g[:, None, :]])  # (B, 4096, 3)

        feat_coarse = self.point_mlp_coarse(pc, train)  # (B, 4096, 512)
        feat_coarse = jnp.max(feat_coarse, axis=1)  # torch max over points
        feat_g2 = feat_g2.reshape(img.shape[0], -1)
        feat_coarse_im = jnp.concatenate([feat_coarse, feat_g2], axis=1)
        if trans_mat is None:
            trans_mat = self.spatial_transformer(feat_coarse_im, train)

        occ = voxelize(pc, self.bb_min, self.bb_max, self.vox_res,
                       dtype=img.dtype)
        enc = {'pc': pc, 'trans_mat': trans_mat, 'occ_in': occ,
               'feat_l2': feat_l2}
        if train:
            # Fold-packed features: lane-dense gather operands for the
            # training sampler (a channels-last (B, R^3, C<=64) operand
            # would be lane-padded to 128 by XLA — 8.6 GB at batch 8).
            # occ_pred comes back f32 straight from the sigmoid (before the
            # bf16 fold-pack) so the occ loss is not quantized.
            vox_feat, _, occ_pred = self.vox_encoder(occ, train, True)
            enc['vox_feat'] = vox_feat
            enc['occ_pred'] = occ_pred
        else:
            vox_feat = self.vox_encoder(occ, train, False)
            enc['vox_feat'] = vox_feat
            enc['occ_pred'] = vox_feat[0][..., 0]
        return enc

    def _vox_metas(self):
        """Static fold-pack metadata per feature scale (mirrors the
        VoxelEncoder2 feature structure: l==2 at R, then one per l>=3 with
        the resolution halving after each)."""
        from list_tpu.ops.sampling import pack_meta
        L = list(self.im_enc_layers)
        R = self.vox_res
        metas = [(R, R, R, L[3], pack_meta((R, R, R, L[3])))]
        res = R
        for l in range(3, len(L) - 1):
            metas.append((res, res, res, L[l + 1],
                          pack_meta((res, res, res, L[l + 1]))))
            res //= 2
        return tuple(metas)

    def decode_sdf(self, query: jnp.ndarray, enc: Dict[str, Any]) -> jnp.ndarray:
        """query: (B, N, 3) world coords in [bb_min, bb_max] -> (B, N) sdf."""
        q = reorder_and_scale_query(query)
        percep = self.percep_pooling(enc['feat_l2'], q, enc['trans_mat'])
        # rank 3 == fold-packed training features; rank 5 == channels-last
        meta = self._vox_metas() if enc['vox_feat'][0].ndim == 3 else None
        return self.sdf_decoder(q, enc['vox_feat'], percep, vox_meta=meta)

    def __call__(self, img: jnp.ndarray, query: jnp.ndarray,
                 trans_mat: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (occ_pred (B,R,R,R), sdf (B,N)) like the reference forward
        (models.py:73-100, which returns vox_feat[0] and sdf)."""
        enc = self.encode(img, train, trans_mat)
        k = self.train_query_chunks
        if train and k > 1 and query.shape[1] > k:
            # Pre-resize the pyramid once so rematerialized chunks skip the
            # 137^2 interpolation matmuls on recompute.
            from list_tpu.ops.sampling import resize_bilinear_align_corners
            ms = self.percep_pooling.map_size
            enc = dict(enc)
            enc['feat_l2'] = [resize_bilinear_align_corners(f, ms, ms)
                              for f in enc['feat_l2']]
            # nn.scan over uniform chunks: ONE compiled chunk program
            # instead of k unrolled copies (the unrolled loop was the
            # train-step compile cliff — 277 s at batch 4; same fix as the
            # dense-grid slab scan).  Ragged tails are zero-padded and
            # sliced off (no cross-query ops in percep/decoder, so padding
            # is numerically exact for the kept rows).
            B, N = query.shape[:2]
            nc = -(-N // k)  # ceil
            if nc * k != N:
                query = jnp.concatenate(
                    [query, jnp.zeros((B, nc * k - N, 3), query.dtype)], 1)
            qs = query.reshape(B, k, nc, 3)

            def body(mdl, carry, qc):
                return carry, LIST.decode_sdf(mdl, qc, enc)

            dec_remat = (self.remat if self.remat_decode is None
                         else self.remat_decode)
            if dec_remat:
                policy = None
                if self.remat_save_samples:
                    import jax
                    names = ['decode_vox']
                    if self.remat_save_samples >= 2:
                        names.append('decode_percep')
                    policy = jax.checkpoint_policies \
                        .save_only_these_names(*names)
                body = nn.remat(body, prevent_cse=False, policy=policy)
            scan = nn.scan(body, variable_broadcast=['params', 'batch_stats'],
                           split_rngs={}, in_axes=1, out_axes=1)
            _, sdf = scan(self, None, qs)  # body sees (B, nc, 3) chunks
            sdf = sdf.reshape(B, k * nc)[:, :N]
        else:
            sdf = self.decode_sdf(query, enc)
        return enc['occ_pred'], sdf
