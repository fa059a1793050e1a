"""Executors: per-model train/test/eval/save logic (reference:
network/executors.py:26-268).

API parity: ``.train(batch)`` -> (pred, loss_dict), ``.test(batch,
eval_pred)`` -> (pred, eval_score), ``.eval(pred, gt)``, ``.save(batch,
pred, fname)``.  The executor owns the TrainState and the jitted step
functions; batches are host numpy dicts.

TPU-first differences:
- the train step is a single jitted (and donated) function: forward, loss,
  grad, optimizer, batch-stat update all fuse into one XLA program.
- LIST inference runs the encoders once and streams the dense grid through
  a jitted chunk decoder with the query axis sharded across the mesh
  (reference loops 32 chunks with 64 host<->device crossings,
  executors.py:215-224).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from list_tpu.eval.metrics import eval_mesh, eval_pointcloud
from list_tpu.ops import (chamfer_loss, create_grid_points_from_bounds,
                          occupancy_loss, sdf_loss)
from list_tpu.parallel import (auto_mesh, batch_sharding, make_mesh,
                               query_sharding, replicated, shard_batch,
                               shard_batch_stacked)
from list_tpu.train.state import TrainState, make_optimizer
from list_tpu.utils import generate_mesh, write_obj


def _to_float_dict(d: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    return {k: float(v) for k, v in d.items()}


def _maybe_checkify(config, step_fn):
    """jit the train step; with --checkify, wrap it in float (NaN/inf/div)
    guards that raise on the host (SURVEY.md §5 race/sanitizer equivalent —
    the reference's commented-out torch.autograd.set_detect_anomaly)."""
    if getattr(config, 'checkify', False):
        from jax.experimental import checkify as chk

        checked = chk.checkify(step_fn, errors=chk.float_checks)
        jitted = jax.jit(checked)

        def run(state, batch):
            err, out = jitted(state, batch)
            err.throw()
            return out

        return run
    return jax.jit(step_fn, donate_argnums=0)


def total_loss(loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum of all entries whose key does not contain 'ignore'
    (reference: train.py:73-75)."""
    total = 0.0
    for k, v in loss_dict.items():
        if 'ignore' not in k:
            total = total + v
    return total


class BaseExecutor:
    model_cls = None

    def __init__(self, config, model, state: Optional[TrainState] = None,
                 mesh=None, init_rng: Optional[jax.Array] = None):
        self.config = config
        self.model = model
        if mesh is not None:
            self.mesh = mesh
        elif getattr(config, 'mesh_shape', None):
            self.mesh = make_mesh(config.mesh_shape)
        else:
            # 1-D data mesh sized to divide the train batch.
            self.mesh = auto_mesh(config.train_batch_size)
        self._rng = init_rng if init_rng is not None else jax.random.PRNGKey(
            getattr(config, 'seed', 333))
        self.state = state
        self._train_multi = None

    # -- state management ----------------------------------------------------
    def init_state(self, sample_batch: Dict[str, np.ndarray],
                   frozen_prefixes=()) -> TrainState:
        variables = self._init_variables(sample_batch)
        tx = make_optimizer(self.config.lr, self.config.beta1,
                            weight_decay=self.config.weight_decay,
                            frozen_prefixes=frozen_prefixes)
        state = TrainState.create(variables['params'],
                                  variables.get('batch_stats', {}), tx)
        # replicate across the mesh
        state = jax.device_put(state, replicated(self.mesh))
        self.state = state
        return state

    def train(self, batch, calc_loss=True):
        raise NotImplementedError

    # -- multi-step dispatch (--steps_per_dispatch) --------------------------
    def _train_keys(self, batch):
        """Subset of batch keys the train step consumes (subclass hook)."""
        return dict(batch)

    def _train_multi_fn(self, state: TrainState, batches):
        """K sequential optimizer steps inside ONE XLA program: lax.scan
        over the leading (step) axis of ``batches``.  The per-step body IS
        ``_train_step_fn``, so numerics match K single dispatches exactly;
        what changes is dispatch count — the r4 post-halo trace showed
        0.25-0.65 s/step of host/dispatch gap between chained single-step
        dispatches on this harness (device step 0.947 s vs 1.2-1.6 s wall),
        which a K-step program amortizes by K.  The reference hot loop runs
        one optimizer step per Python iteration (train.py:63-115)."""
        def body(st, b):
            st, losses = self._train_step_fn(st, b)
            return st, losses

        return jax.lax.scan(body, state, batches)

    def train_multi(self, batches):
        """Run ``len(batches)`` train steps in one device dispatch.

        ``batches``: list of host batch dicts (identical shapes).  Returns
        (None, losses) where each loss entry is a (K,) array — one value
        per step, in order.  Uses plain jit (no checkify wrap; use
        --steps_per_dispatch 1 when debugging with --checkify)."""
        kept = [self._train_keys(b) for b in batches]
        stacked = {k: np.stack([b[k] for b in kept]) for k in kept[0]}
        stacked = shard_batch_stacked(self.mesh, stacked)
        return self.train_multi_device(stacked)

    def train_multi_device(self, stacked):
        """train_multi on an already device-put/sharded (K, B, ...) stacked
        batch dict (bench pre-puts the batch once so the timed loop pays no
        host->device upload)."""
        if self._train_multi is None:
            self._train_multi = jax.jit(self._train_multi_fn,
                                        donate_argnums=0)
        self.state, losses = self._train_multi(self.state, stacked)
        return None, losses


class CoarseNetExecutor(BaseExecutor):
    """Stage-1 executor (reference: executors.py:26-99)."""

    def __init__(self, config, model, **kw):
        super().__init__(config, model, **kw)
        self.coarse_points = config.coarse_point_density
        self.eval_fn = eval_pointcloud
        self._train_step = _maybe_checkify(config, self._train_step_fn)
        self._predict = jax.jit(self._predict_fn)

    def _init_variables(self, batch):
        # batch-1 init: no parameter shape depends on the batch size.
        # jit'd: eager flax init pays one backend round trip PER OP on the
        # axon relay (measured 200+ s for the LIST init); jitted it is one
        # persistent-cacheable program.
        img = jnp.asarray(batch['rgb_image'])
        img1 = jnp.zeros((1,) + img.shape[1:], img.dtype)
        return jax.jit(self.model.init)(self._rng, img1)

    def _train_step_fn(self, state: TrainState, batch):
        def loss_fn(params):
            pred, updates = self.model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['rgb_image'], train=True, mutable=['batch_stats'])
            loss = chamfer_loss(pred, batch['pc'])
            return loss, (pred, updates['batch_stats'])

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {'chamfer_loss': loss}

    def _predict_fn(self, state: TrainState, img):
        return self.model.apply({'params': state.params,
                                 'batch_stats': state.batch_stats}, img)

    def _train_keys(self, batch):
        return {'rgb_image': batch['rgb_image'], 'pc': batch['pc']}

    def train(self, batch, calc_loss: bool = True):
        batch = shard_batch(self.mesh, self._train_keys(batch))
        self.state, losses = self._train_step(self.state, batch)
        return None, losses

    def test(self, batch, eval_pred: bool = False):
        if isinstance(batch, dict):
            rgb, gt = batch['rgb_image'], batch.get('pc')
        else:
            rgb, gt = batch
        pred = np.asarray(self._predict(self.state, jnp.asarray(rgb)))
        eval_score = self.eval(pred, np.asarray(gt)) if eval_pred else {}
        return pred, eval_score

    def eval(self, pred, gt) -> Dict[str, float]:
        if pred.shape[0] > 1:
            print('Evaluation of multiple predictions (batch_size > 1) '
                  'is not allowed.')
            return {}
        pred = np.asarray(pred)[0]
        gt = np.asarray(gt)[0] if gt.ndim == 3 else np.asarray(gt)
        if pred.shape[0] != gt.shape[0]:
            sample_pids = np.random.randint(gt.shape[0], size=pred.shape[0])
            gt = gt[sample_pids, :]
        return self.eval_fn(pred, gt)

    def save(self, batch, pred, fname: str):
        pred = np.asarray(pred)
        if pred.shape[0] > 1:
            print('Saving multiple predictions (batch_size > 1) '
                  'is not allowed.')
            return {}
        write_obj(fname + '_pred.obj', pred[0], [])


class LISTExecutor(BaseExecutor):
    """Stage-2 executor (reference: executors.py:102-268)."""

    def __init__(self, config, model, **kw):
        super().__init__(config, model, **kw)
        self.test_pointnum = config.test_pointnum
        self.sdf_scale = config.sdf_scale
        self.max_dist = config.sdf_max_dist
        self.mcube_znum = config.mcube_znum
        self.bb_min = config.bb_min
        self.bb_max = config.bb_max
        self.vox_res = config.vox_res
        self.eval_fn = eval_mesh
        self._grid_chunks = None
        self._train_step = _maybe_checkify(config, self._train_step_fn)
        self._encode = jax.jit(self._encode_fn)
        self._decode = jax.jit(self._decode_fn)
        # Fused per-mesh inference: encode + dense decode + sdf_scale divide
        # + wire cast in ONE dispatch.  The relay charges ~30 ms of
        # non-overlapped wall per dispatch (the batch-1 encoder is ~10 ms
        # of device work in a 42 ms wall), so collapsing the 3-dispatch
        # predict path is worth ~0.05 s/mesh on the sweep.
        _statics = ('slab', 'use_pallas', 'scan_unroll', 'wire_name',
                    'mesh', 'shard_axis', 'fetch_mode')
        self._predict_dense = jax.jit(self._predict_dense_fn,
                                      static_argnames=_statics)
        self._dense_finish = jax.jit(self._dense_finish_fn,
                                     static_argnames=_statics)

    def _init_variables(self, batch):
        # Init on a batch-1, vox_res-32 clone: no parameter or batch-stat
        # shape depends on the voxel resolution or the batch size (convs
        # and Dense layers are resolution-independent), and initializing
        # through the full 128^3 batch-4 forward cost ~275 s of compile on
        # this host.  The clone's init tree is bit-identical (same RNG
        # split structure, same module graph).
        img1 = jnp.zeros((1,) + jnp.asarray(batch['rgb_image']).shape[1:],
                         jnp.asarray(batch['rgb_image']).dtype)
        query = jnp.zeros((1, 8, 3), img1.dtype)
        small = self.model
        if getattr(self.model, 'vox_res', 32) > 32:
            small = self.model.clone(vox_res=32)
        # jit'd: eager flax init runs op-by-op — one axon-relay round trip
        # per op, measured 205 s of the 383 s train first-step wall
        # (tools/probe_compile_breakdown.py).  Jitted it is one program,
        # and the persistent cache makes reruns near-free.
        return jax.jit(small.init)(self._rng, img1, query)

    def calc_loss(self, pred, gt) -> Dict[str, jnp.ndarray]:
        occ_pred, sdf_pred = pred
        occ_gt, sdf_gt = gt
        losses = {'occ_loss': occupancy_loss(occ_pred, occ_gt)}
        losses.update(sdf_loss(sdf_pred, sdf_gt, self.sdf_scale))
        return losses

    def _train_step_fn(self, state: TrainState, batch):
        trans_mat = batch.get('transmat')
        if getattr(self.config, 'sort_queries', 0):
            # Sort each sample's queries by voxel cell (x-major, the packed
            # gather operands' row order).  Exact: every train loss is a
            # permutation-invariant reduction over the query axis, and
            # points/values are permuted together.  Measured on v5e: no
            # gain (gather DMAs don't reward index locality) — off by
            # default, kept as a tuning knob for other topologies.
            from list_tpu.ops.grid import voxel_indices
            pts, vals = batch['points'], batch['values']
            r = self.vox_res
            ijk = voxel_indices(pts, self.bb_min, self.bb_max, r)
            key = (ijk[..., 0] * r + ijk[..., 1]) * r + ijk[..., 2]
            order = jnp.argsort(key, axis=1)
            batch = dict(batch,
                         points=jnp.take_along_axis(pts, order[..., None], 1),
                         values=jnp.take_along_axis(vals, order, 1))

        occ_gt = batch['occ']
        if occ_gt.dtype != jnp.float32:  # uint8 wire (see _train_keys)
            occ_gt = occ_gt.astype(jnp.float32)

        def loss_fn(params):
            (occ_pred, sdf_pred), updates = self.model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['rgb_image'], batch['points'], trans_mat, True,
                mutable=['batch_stats'])
            losses = self.calc_loss((occ_pred, sdf_pred),
                                    (occ_gt, batch['values']))
            return total_loss(losses), (losses, updates['batch_stats'])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, losses

    def _encode_fn(self, state: TrainState, img, trans_mat=None):
        return self.model.apply({'params': state.params,
                                 'batch_stats': state.batch_stats}, img,
                                train=False, trans_mat=trans_mat,
                                method=self.model.encode)

    def _decode_fn(self, state: TrainState, query, enc):
        return self.model.apply({'params': state.params,
                                 'batch_stats': state.batch_stats}, query,
                                enc, method=self.model.decode_sdf)

    def _dense_finish_fn(self, params_dec, vox_feat, feat_l2, trans_mat, *,
                         slab, use_pallas, scan_unroll, wire_name,
                         mesh=None, shard_axis=None, fetch_mode='grid'):
        """Dense decode + on-device sdf_scale divide + wire cast (one
        jitted unit; nested dense_grid_sdf jit inlines).

        fetch_mode='band' additionally packs the iso-band wire buffer
        (ops/band.py band_encode) in the SAME dispatch: signs + crossing-
        adjacent values, ~0.77 MB instead of the 4.2 MB bf16 grid — the
        weather-proof fetch (VERDICT r4 #3)."""
        from list_tpu.ops.dense_grid import dense_grid_sdf
        mesh_kw = ({'mesh': mesh, 'shard_axis': shard_axis}
                   if mesh is not None and shard_axis is not None else {})
        pc = int(getattr(self.config, 'percep_collapse', -1))
        if pc < 0:  # auto: the measured winner per head (r5 A/B)
            pc = int(use_pallas) == 2
        grid = dense_grid_sdf(params_dec, vox_feat, feat_l2, trans_mat,
                              self.vox_res, slab=slab, bb_min=self.bb_min,
                              bb_max=self.bb_max, use_pallas=use_pallas,
                              scan_unroll=scan_unroll,
                              percep_collapse=bool(pc), **mesh_kw)
        wire = jnp.bfloat16 if wire_name == 'bfloat16' else jnp.float32
        grid = (grid / self.sdf_scale).astype(wire)
        if fetch_mode == 'band':
            from list_tpu.ops.band import band_encode
            return {'grid': grid, 'band': band_encode(grid)}
        return grid

    def _predict_dense_fn(self, state: TrainState, img, trans_mat=None, *,
                          slab, use_pallas, scan_unroll, wire_name,
                          mesh=None, shard_axis=None, fetch_mode='grid'):
        enc = self._encode_fn(state, img, trans_mat)
        return self._dense_finish_fn(
            state.params['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
            enc['trans_mat'], slab=slab, use_pallas=use_pallas,
            scan_unroll=scan_unroll, wire_name=wire_name, mesh=mesh,
            shard_axis=shard_axis, fetch_mode=fetch_mode)

    # -- training ------------------------------------------------------------
    def _train_keys(self, batch):
        keep = {k: batch[k] for k in ('rgb_image', 'points', 'values', 'occ')}
        if 'transmat' in batch:
            keep['transmat'] = batch['transmat']
        # exactly-binary occupancy rides host->device as uint8 (4x fewer
        # bytes: 33 -> 8 MB per batch-4 step, and 4x less stacked-batch
        # HBM under --steps_per_dispatch); the step casts back to f32 —
        # bit-exact for 0/1 targets.  Soft occupancies pass through.
        occ = keep.get('occ')
        if isinstance(occ, np.ndarray) and occ.dtype == np.float32 \
                and ((occ == 0) | (occ == 1)).all():
            keep['occ'] = occ.astype(np.uint8)
        return keep

    def train(self, batch, calc_loss: bool = True):
        keep = shard_batch(self.mesh, self._train_keys(batch))
        self.state, losses = self._train_step(self.state, keep)
        return None, losses

    # -- dense-grid inference ------------------------------------------------
    def create_grid(self) -> np.ndarray:
        return create_grid_points_from_bounds(self.bb_min, self.bb_max,
                                              self.vox_res)

    def _get_grid_chunks(self):
        if self._grid_chunks is None:
            grid = create_grid_points_from_bounds(self.bb_min, self.bb_max,
                                                  self.vox_res)
            grid = grid.astype(np.float32)[None]  # (1, R^3, 3)
            n = grid.shape[1]
            chunk = self.test_pointnum
            self._grid_chunks = [
                jnp.asarray(grid[:, s:s + chunk])
                for s in range(0, n, chunk)]
        return self._grid_chunks

    def _dense_plan(self, ndev: int = 1):
        """Resolve (slab, use_pallas, scan_unroll) for the dense decode.

        The dense path scans shape-uniform x-slabs, so the slab size must
        divide vox_res; odd resolutions (e.g. 120, 125) get slab=None and
        callers fall back to the chunked decoder.  On a multi-device mesh
        the slab count must also split evenly across the sharded axis.

        Auto head/slab selection (r3 on-chip A/Bs, one v5e):
        - single device, R <= 128, TPU: SINGLE slab (slab=R) + the
          split-parts fused Pallas head — the whole grid in one scan step
          feeds one fused kernel; 0.201 s full predict dispatch at 128^3
          vs 0.335 for slab=64 (the full-lane projection rework shrank
          the program enough that slab=128 now compiles — it used to
          crash the remote TPU compiler, and still does with the XLA
          head, so slab=R is only ever paired with use_pallas=2).
        - otherwise the XLA head: post-rework it beats the multi-slab
          fused head (0.197 vs 0.335 at slab=64/128^3) and was already
          faster at 256^3 (1.58 vs 2.0, slab=8).
        An explicit --use_pallas 0/1/2 overrides the head choice (but
        never pairs the XLA head with slab=R).  Mosaic kernels have no
        CPU lowering, so CPU always gets the XLA head."""
        from list_tpu.ops.dense_grid import fused_head_tile
        R = self.vox_res
        cfg_up = int(getattr(self.config, 'use_pallas', -1))
        on_tpu = jax.devices()[0].platform != 'cpu'
        if (on_tpu and ndev == 1 and R <= 128 and cfg_up in (-1, 2)
                and fused_head_tile(R * R * R) is not None):
            # tile gate: if the fused head can't engage, dense_grid_sdf
            # would silently fall back to the XLA head at slab=R — a
            # compiler-crashing program at large R (see fused_head_tile)
            return R, 2, 1
        pref = (64, 32, 16, 8, 4, 2) if R <= 192 else (8, 4, 2)
        slab = next((s for s in pref if R % s == 0
                     and (R // s) % ndev == 0), None)
        if slab is None:
            return None, 0, 1
        use_pallas = cfg_up if (cfg_up >= 0 and on_tpu) else 0
        return slab, use_pallas, (1 if slab >= 32 else 2)

    def predict_grid(self, rgb_image: np.ndarray,
                     trans_mat: Optional[np.ndarray] = None,
                     fast: Optional[bool] = None,
                     device_out: bool = False,
                     fetch_dtype: Optional[str] = None,
                     fetch_mode: Optional[str] = None) -> np.ndarray:
        """Dense (vox_res^3) SDF field for one image.

        fast path (default): gather-free dense-grid decode
        (ops.dense_grid.dense_grid_sdf) — regular-grid trilinear sampling
        restructured into static-index axis resampling + one MXU matmul.
        fallback: the reference-style chunked decode with the query axis
        sharded across the mesh.

        device_out=True returns the (R, R, R) grid as a device array
        WITHOUT the device->host fetch, so callers can overlap the fetch
        (np.asarray in a worker thread) with the next image's device
        compute — the infer pipeline and bench do this; a blocking fetch
        idles the chip for the full host-link round trip per mesh.

        fetch_dtype (default --fetch_dtype, 'bfloat16'): wire dtype of the
        returned grid.  bf16 halves host-link bytes; marching cubes only
        interpolates edges that cross zero, where bf16's 8-bit mantissa
        keeps full RELATIVE precision, so vertex positions shift < 1e-4
        world units.  Host callers upcast after the fetch.  Pass 'float32'
        for a bit-exact grid (parity tests do).

        fetch_mode (default --fetch_mode): 'band' packs the iso-band wire
        buffer on device and device_out returns an ops.band.BandGrid
        (fetch workers call fetch_grid_f32 / .to_numpy()); 'grid' ships
        the full wire grid.  Band applies to the fast dense path only —
        the chunked fallback always returns the grid."""
        if fetch_dtype is None:
            fetch_dtype = getattr(self.config, 'fetch_dtype', 'float32')
        if fetch_mode is None:
            fetch_mode = getattr(self.config, 'fetch_mode', 'grid')
        wire = jnp.bfloat16 if fetch_dtype == 'bfloat16' else jnp.float32
        img = jnp.asarray(rgb_image)
        tm = None if trans_mat is None else jnp.asarray(trans_mat)
        if fast is None:
            fast = bool(getattr(self.config, 'fast_grid', 1)) \
                and img.shape[0] == 1
        from list_tpu.parallel import DATA_AXIS, QUERY_AXIS
        ndev = 1
        for ax in (QUERY_AXIS, DATA_AXIS):
            if ax in self.mesh.axis_names and self.mesh.shape[ax] > 1:
                ndev = self.mesh.shape[ax]
                break
        slab, use_pallas, unroll = self._dense_plan(ndev)
        if fast and slab is None:
            fast = False
        if fast:
            # Multi-device mesh: shard the x-slab scan over the query axis
            # (features replicated, no collectives — SURVEY §2.7).
            mesh_kw = {'mesh': None, 'shard_axis': None}
            for ax in (QUERY_AXIS, DATA_AXIS):
                if ax in self.mesh.axis_names and self.mesh.shape[ax] > 1 \
                        and (self.vox_res // slab) % self.mesh.shape[ax] == 0:
                    mesh_kw = {'mesh': self.mesh, 'shard_axis': ax}
                    break
            # ONE dispatch: encode + decode + on-device sdf_scale divide +
            # wire cast (the host-side 2.1M-float divide cost ~10 ms, and
            # each extra dispatch ~30 ms of relay wall)
            band = fetch_mode == 'band'
            out = self._predict_dense(self.state, img, tm, slab=slab,
                                      use_pallas=use_pallas,
                                      scan_unroll=unroll,
                                      wire_name=fetch_dtype,
                                      fetch_mode=fetch_mode, **mesh_kw)
            if band:
                from list_tpu.ops.band import BandGrid
                out = BandGrid(out['band'], out['grid'], self.vox_res,
                               fetch_dtype)
                return out if device_out else out.to_numpy()
            if device_out:
                return out
            return np.asarray(out).astype(np.float32)
        enc = self._encode(self.state, img, tm)
        qsh = query_sharding(self.mesh)
        # query-axis mesh extent: a ragged tail chunk (R^3 % test_pointnum
        # != 0, e.g. odd vox_res) can't be evenly query-sharded — leave it
        # replicated (device_put with an indivisible spec raises).
        from list_tpu.parallel import DATA_AXIS, QUERY_AXIS
        _ax = (QUERY_AXIS if QUERY_AXIS in self.mesh.axis_names
               else DATA_AXIS)
        nsh = self.mesh.shape[_ax]
        vals = []
        for chunk in self._get_grid_chunks():
            if chunk.shape[1] % nsh == 0:
                chunk = jax.device_put(chunk, qsh)
            vals.append(self._decode(self.state, chunk, enc))
        pred = jnp.concatenate(vals, axis=1)
        pred = (pred.reshape((self.vox_res,) * 3)
                / self.sdf_scale).astype(wire)
        if device_out:
            return pred
        return np.asarray(pred).astype(np.float32)

    def predict_grid_batch(self, rgb_images: np.ndarray,
                           trans_mats: Optional[np.ndarray] = None,
                           device_out: bool = False,
                           fetch_dtype: Optional[str] = None,
                           fetch_mode: Optional[str] = None):
        """Dense SDF fields for B images with ONE batched encoder pass.

        The encoder is op-dispatch bound at batch 1 (two ResNet18s = many
        tiny kernels: ~10 ms of device work inside a 42 ms wall, r3
        trace), so the sweep encodes B images per dispatch and then runs
        the per-mesh dense decode off slices of the batched encoding —
        separate dispatches on purpose: a lax.map'd batched decode
        measured slower (0.282 vs 0.252 s/mesh) and a vmapped one crashed
        the XLA TPU compiler.  The reference test sweep is one shape per
        dispatch end-to-end (test.py:85-110).

        Returns a list of B (R, R, R) device arrays when device_out=True
        (each independently fetchable, so the pipeline overlaps per-mesh
        fetches), else a stacked (B, R, R, R) float32 numpy array."""
        if fetch_dtype is None:
            fetch_dtype = getattr(self.config, 'fetch_dtype', 'float32')
        if fetch_mode is None:
            fetch_mode = getattr(self.config, 'fetch_mode', 'grid')
        imgs = jnp.asarray(rgb_images)
        slab, use_pallas, unroll = self._dense_plan(1)
        fast = bool(getattr(self.config, 'fast_grid', 1)) and slab is not None
        multichip = any(self.mesh.shape[ax] > 1 for ax in self.mesh.axis_names)
        if not fast or multichip:
            grids = [self.predict_grid(
                imgs[i:i + 1],
                None if trans_mats is None else trans_mats[i:i + 1],
                device_out=True, fetch_dtype=fetch_dtype,
                fetch_mode=fetch_mode)
                for i in range(imgs.shape[0])]
        else:
            from list_tpu.ops.band import BandGrid
            enc = self._encode(self.state, imgs,
                               None if trans_mats is None
                               else jnp.asarray(trans_mats))
            grids = []
            for i in range(imgs.shape[0]):
                # one dispatch per mesh: decode + divide + wire cast fused
                out = self._dense_finish(
                    self.state.params['sdf_decoder'],
                    [f[i:i + 1] for f in enc['vox_feat']],
                    [f[i:i + 1] for f in enc['feat_l2']],
                    enc['trans_mat'][i:i + 1], slab=slab,
                    use_pallas=use_pallas,
                    scan_unroll=unroll,
                    wire_name=fetch_dtype, fetch_mode=fetch_mode)
                if fetch_mode == 'band':
                    out = BandGrid(out['band'], out['grid'], self.vox_res,
                                   fetch_dtype)
                grids.append(out)
        if device_out:
            return grids
        from list_tpu.ops.band import fetch_grid_f32
        return np.stack([fetch_grid_f32(g) for g in grids])

    def test(self, batch, eval_pred: bool = False):
        img = batch['rgb_image']
        mesh_gt = batch.get('gt_mesh')
        trans_mat = batch.get('transmat')
        pred_values = self.predict_grid(img, trans_mat)
        pred_mesh = generate_mesh(pred_values, self.bb_min, self.bb_max,
                                  as_trimesh_obj=True,
                                  renorm=getattr(self.config, 'mesh_renorm',
                                                 'reference'))
        eval_score = (self.eval(pred_mesh, mesh_gt)
                      if eval_pred and mesh_gt is not None else {})
        return [pred_mesh, pred_values], eval_score

    def eval(self, pred, gt) -> Dict[str, float]:
        return self.eval_fn(pred, gt, self.bb_min, self.bb_max)

    def save(self, batch, pred, fname: str):
        pred_mesh = pred[0]
        pred_mesh.export(fname + '_pred.obj')
