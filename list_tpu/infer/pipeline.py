"""Full-split inference pipeline (reference: test.py:14-167).

Per shape: fetch test data, reuse a cached ``_pred.obj`` when present
(re-evaluating the saved mesh), otherwise run dense-grid SDF inference and
mesh extraction; accumulate per-category metrics into a CSV with an appended
mean row.  Supports manual test-set sharding via --chunk_s/--chunk_l.

TPU-first addition: device grid evaluation of shape i+1 overlaps the
host-side marching cubes + KD-tree/ray-stab eval of shape i.  A dedicated
fetch pool streams up to 4 meshes' device->host grid transfers
concurrently (np.asarray releases the GIL), while marching cubes + eval
run on a single ordered worker thread (the native routines are ctypes
calls that release the GIL, so the overlap is real); the pipeline is
bounded at 4 meshes in flight.  Executors without a ``predict_grid``
(CoarseNet) fall back to the serial per-shape path.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from list_tpu import registry
from list_tpu.train import checkpoints as ckpt
from list_tpu.train.trainer import build_executor, build_model
from list_tpu.utils.logging import write_scores_csv
from list_tpu.utils.meshing import generate_mesh
from list_tpu.utils.meshio import load_mesh


def test_one_without_gttransmat(executor, dataset, cat_id, shape_id,
                                output_dir, cam_id, eval_pred
                                ) -> Dict[str, float]:
    """Serial per-shape path (kept for executors without predict_grid and
    for API parity with the reference's test_one_*, test.py:14-52)."""
    os.makedirs(os.path.join(output_dir, cat_id, shape_id), exist_ok=True)
    eval_score: Dict[str, float] = {}
    fname = os.path.join(output_dir, cat_id, shape_id, str(cam_id).zfill(2))
    batch = dataset.get_testdata(cat_id, shape_id, cam_id)
    if os.path.exists(fname + '_pred.obj'):
        try:
            pred = load_mesh(fname + '_pred.obj')
            if eval_pred and batch.get('gt_mesh') is not None:
                eval_score = executor.eval(pred, batch['gt_mesh'])
        except Exception:
            pred, eval_score = executor.test(batch, eval_pred)
            executor.save(batch, pred, fname)
    else:
        start = time.time()
        pred, eval_score = executor.test(batch, eval_pred)
        executor.save(batch, pred, fname)
        print('Time', time.time() - start)
    return eval_score


def _device_infer(executor, dataset, cat_id, shape_id, output_dir, cam_id):
    """Device part of one shape: returns (batch, fname, pred_values).
    pred_values is None when a cached mesh exists (host-only re-eval)."""
    os.makedirs(os.path.join(output_dir, cat_id, shape_id), exist_ok=True)
    fname = os.path.join(output_dir, cat_id, shape_id, str(cam_id).zfill(2))
    batch = dataset.get_testdata(cat_id, shape_id, cam_id)
    if os.path.exists(fname + '_pred.obj'):
        return batch, fname, None
    # device_out: hand the worker thread a device array so the
    # device->host fetch (np.asarray releases the GIL) overlaps the next
    # shape's device compute instead of idling the chip for a full host-
    # link round trip per mesh.
    pred_values = executor.predict_grid(batch['rgb_image'],
                                        batch.get('transmat'),
                                        device_out=True)
    return batch, fname, pred_values


def _fetch_f32(pred_values) -> np.ndarray:
    """Device->host fetch + f32 upcast (bf16 --fetch_dtype wire, band
    decode for --fetch_mode band BandGrids); runs on the fetch pool so
    several meshes' host-link transfers proceed while the device computes
    and the host worker meshes (the harness relay's bandwidth is bursty —
    a single serialized fetch stream can stall the whole sweep for
    seconds per mesh)."""
    from list_tpu.ops.band import fetch_grid_f32
    return fetch_grid_f32(pred_values)


def _host_finish(executor, batch, fname, pred_values, eval_pred
                 ) -> Dict[str, float]:
    """Host part of one shape: marching cubes + save + eval (worker thread;
    mesh/eval natives release the GIL).  ``pred_values`` may be a Future
    from the fetch pool (already-started device->host transfer)."""
    if pred_values is None:
        try:
            pred = load_mesh(fname + '_pred.obj')
            if eval_pred and batch.get('gt_mesh') is not None:
                return executor.eval(pred, batch['gt_mesh'])
            return {}
        except Exception:
            pred_values = executor.predict_grid(batch['rgb_image'],
                                                batch.get('transmat'))
    if hasattr(pred_values, 'result'):  # fetch-pool future
        pred_values = pred_values.result()
    # upcast if the fetch didn't already (bf16 --fetch_dtype wire; marching
    # cubes wants f32)
    pred_values = np.asarray(pred_values).astype(np.float32)
    mesh = generate_mesh(pred_values, executor.bb_min, executor.bb_max,
                         as_trimesh_obj=True,
                         renorm=getattr(executor.config, 'mesh_renorm',
                                        'reference'))
    mesh.export(fname + '_pred.obj')
    if eval_pred and batch.get('gt_mesh') is not None:
        return executor.eval(mesh, batch['gt_mesh'])
    return {}


def test_all(config) -> Optional[str]:
    """Returns the CSV path (None when nothing was evaluated)."""
    # --multihost: strided per-process test-list sharding on top of the
    # manual --chunk_s/--chunk_l window (reference test.py:108-113); each
    # process writes its own CSV chunk for evaluate_gather to merge.
    from list_tpu.parallel import multihost
    multihost.maybe_initialize(config)
    model = build_model(config)
    Dataset = registry.get_class(registry.resolve(config.dataset))
    testset = Dataset(config, 'test')
    test_size = len(testset.datalist)

    import jax
    if jax.process_count() > 1:
        # Per-process strided sharding gives each process DIFFERENT shapes
        # (and counts), so the executor's predict programs must not span
        # the global mesh (independent per-process work over a cross-host
        # mesh is mismatched SPMD — ADVICE r4).  Build a local-devices
        # mesh: each process sweeps its shard fully independently, the
        # multihost analog of the reference's --chunk_s/--chunk_l manual
        # sharding (test.py:108-113).
        from list_tpu.parallel import make_mesh
        local = jax.local_devices()
        executor = build_executor(
            config, model, mesh=make_mesh((len(local),), devices=local))
    else:
        executor = build_executor(config, model)
    # init state from a dummy batch shaped like test data
    first = testset.datalist[0]
    batch0 = testset.get_testdata(
        first['cat_id'], first['shape_id'],
        first.get('img_id', '00.png').split('.')[0]
        if 'img_id' in first else config.test_cam_id)
    init_batch = {'rgb_image': batch0['rgb_image']}
    if hasattr(executor, '_init_variables'):
        executor.init_state(init_batch)

    epoch = 0
    ch_fn = os.path.join(config.checkpoint_dir, config.test_checkpoint)
    fallback = os.path.join(config.checkpoint_dir, 'best_model_train.ckpt')
    if os.path.exists(ch_fn):
        epoch, executor.state, best = ckpt.load_checkpoint(
            ch_fn, executor.state, restore_opt=False)
        print(f'pretrained model loaded at epoch: {epoch}, '
              f'best test loss: {best}')
    elif os.path.exists(fallback):
        epoch, executor.state, best = ckpt.load_checkpoint(
            fallback, executor.state, restore_opt=False)
        print(f'pretrained model loaded at epoch: {epoch}, '
              f'best train loss: {best}')
    else:
        print('No pretrained model was loaded')
        return None

    output_dir = os.path.join(config.results_dir, f'test_{epoch}')
    os.makedirs(output_dir, exist_ok=True)

    eval_scores: Dict[str, float] = {}
    rows: List[Dict] = []
    start_idx = config.chunk_s
    chunk = test_size if (config.chunk_l == 0
                          or start_idx + config.chunk_l > test_size) \
        else config.chunk_l + 1
    datalist = multihost.shard_datalist(
        testset.datalist[start_idx:start_idx + chunk])
    chunk = len(datalist)

    overlap = hasattr(executor, 'predict_grid')
    # Host meshing/eval workers: marching cubes + KD-tree chamfer + ray-stab
    # IoU per shape.  The native per-point loops release the GIL and thread
    # internally (libmesh.cpp parallel_for), so a few concurrent shapes
    # saturate a multi-core host; LIST_TPU_EVAL_WORKERS overrides.
    n_eval_workers = int(os.environ.get('LIST_TPU_EVAL_WORKERS', 0)) \
        or max(1, min(4, (os.cpu_count() or 1)))
    # Each _host_finish drives libmesh parallel_for loops that default to
    # hardware_concurrency() threads — n_eval_workers concurrent shapes
    # would oversubscribe the CPU n_eval_workers-fold (ADVICE r4).  Split
    # the cores between the pooled shapes instead (explicit env wins).
    if overlap and 'LIST_TPU_NATIVE_THREADS' not in os.environ:
        os.environ['LIST_TPU_NATIVE_THREADS'] = str(
            max(1, (os.cpu_count() or 1) // n_eval_workers))
    pool = ThreadPoolExecutor(max_workers=n_eval_workers) if overlap else None
    # Dedicated fetch pool: device->host grid transfers for up to 4 meshes
    # proceed concurrently with device compute AND the (serial) host
    # meshing worker.  Probed on the harness relay (tools/probe_fetch.py):
    # concurrent streams sustain 21-37 MB/s where one stream can stall at
    # <1 MB/s for seconds of "tunnel weather"; on a real PCIe host this
    # just overlaps DMA with MC.
    fetch_pool = ThreadPoolExecutor(max_workers=4) if overlap else None
    pipeline_depth = 4  # meshes in flight (device grid + host f32 copies)

    eval_start = time.time()
    done = 0

    def record(eval_score, cat_id, shape_id, cam_id, shape_start,
               batch_idx):
        nonlocal done
        if config.eval_pred:
            row = {'ID': f'{shape_id}_{str(cam_id).zfill(2)}'}
            row.update(eval_score)
            rows.append(row)
        for k, v in eval_score.items():
            if np.isnan(v):
                continue
            eval_scores[k] = eval_scores.get(k, 0.0) + v
        done += 1
        eta = ((time.time() - eval_start) / done) * chunk \
            - (time.time() - eval_start)
        h = int(eta // 3600)
        m = int((eta - 3600 * h) // 60)
        s = int(eta - 3600 * h - 60 * m)
        print(f'Finished: {start_idx + done}/{start_idx + chunk} || '
              f'Time: {time.time() - shape_start:0.5f} || '
              f'ETA: {h:02d}h:{m:02d}m:{s:02d}s')

    infer_batch = max(int(getattr(config, 'infer_batch', 1) or 1), 1)
    cat_id = 'all'
    if overlap and infer_batch > 1 \
            and hasattr(executor, 'predict_grid_batch'):
        # Batched device decode (--infer_batch): B meshes per dispatch
        # amortize the encoder pass + per-slab fixed costs; host
        # meshing/eval still runs per shape on the worker thread, draining
        # the previous group while the current group computes on device.
        items = []
        for data in datalist:
            cam_ids = ([data['img_id'].split('.')[0]] if 'img_id' in data
                       else [config.test_cam_id])
            items.extend((data['cat_id'], data['shape_id'], c)
                         for c in cam_ids)
        pendings: List = []

        def drain():
            for fut, meta in pendings:
                record(fut.result(), *meta)
            pendings.clear()

        for g0 in range(0, len(items), infer_batch):
            group = items[g0:g0 + infer_batch]
            shape_start = time.time()
            entries = []
            uncached = []
            for cat_id, shape_id, cam_id in group:
                os.makedirs(os.path.join(output_dir, cat_id, shape_id),
                            exist_ok=True)
                fname = os.path.join(output_dir, cat_id, shape_id,
                                     str(cam_id).zfill(2))
                batch = testset.get_testdata(cat_id, shape_id, cam_id)
                meta = (cat_id, shape_id, cam_id, shape_start, g0)
                entries.append([batch, fname, meta, None])
                if not os.path.exists(fname + '_pred.obj'):
                    uncached.append(entries[-1])
            if uncached:
                imgs = np.concatenate(
                    [e[0]['rgb_image'] for e in uncached])
                tms = None
                if uncached[0][0].get('transmat') is not None:
                    tms = np.concatenate(
                        [e[0]['transmat'] for e in uncached])
                grids = executor.predict_grid_batch(imgs, tms,
                                                    device_out=True)
                for i, e in enumerate(uncached):
                    e[3] = fetch_pool.submit(_fetch_f32, grids[i])
            drain()
            for batch, fname, meta, vals in entries:
                pendings.append(
                    (pool.submit(_host_finish, executor, batch, fname,
                                 vals, config.eval_pred), meta))
        drain()
    else:
        from collections import deque
        pendings_q = deque()  # (future, *meta), up to pipeline_depth deep
        for batch_idx, data in enumerate(datalist):
            cat_id = data['cat_id']
            shape_id = data['shape_id']
            shape_start = time.time()
            cam_ids = ([data['img_id'].split('.')[0]] if 'img_id' in data
                       else [config.test_cam_id])
            for cam_id in cam_ids:
                if overlap:
                    batch, fname, vals = _device_infer(
                        executor, testset, cat_id, shape_id, output_dir,
                        cam_id)
                    if vals is not None:
                        vals = fetch_pool.submit(_fetch_f32, vals)
                    while len(pendings_q) >= pipeline_depth:
                        fut, *meta = pendings_q.popleft()
                        record(fut.result(), *meta)
                    pendings_q.append(
                        (pool.submit(_host_finish, executor, batch,
                                     fname, vals, config.eval_pred),
                         cat_id, shape_id, cam_id, shape_start,
                         batch_idx))
                else:
                    eval_score = test_one_without_gttransmat(
                        executor, testset, cat_id, shape_id, output_dir,
                        cam_id, config.eval_pred)
                    record(eval_score, cat_id, shape_id, cam_id, shape_start,
                           batch_idx)

        while pendings_q:
            fut, *meta = pendings_q.popleft()
            record(fut.result(), *meta)
    if pool is not None:
        pool.shutdown(wait=True)
    if fetch_pool is not None:
        fetch_pool.shutdown(wait=True)

    logline = f'{config.exp_name} Test: epoch {epoch + 1:03d} '
    denom = max(config.chunk_l, 1)
    for k, v in eval_scores.items():
        logline += f'{k}: {v / denom:7.3f}, '
    print(logline)

    csv_path = None
    if config.eval_pred and rows:
        import jax
        suffix = (f'_p{jax.process_index()}'
                  if jax.process_count() > 1 else '')
        csv_path = os.path.join(output_dir, f'{cat_id}{suffix}.csv')
        write_scores_csv(csv_path, rows, mean_row=True)
    return csv_path
