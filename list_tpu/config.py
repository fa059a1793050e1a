"""Configuration system with CLI parity to the reference.

Flag names, defaults, and semantics mirror the reference's single argparse
namespace (reference: arguments.py:4-133) so ShapeNet/Pix3D experiment
commands run unchanged; TPU-specific knobs are added at the bottom and are
all optional.  ``--model``/``--dataset`` accept both reference dotted paths
(``network.models.LIST``) and native ones (``list_tpu.models.LIST``); see
list_tpu.registry for the mapping.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser, Namespace
from typing import Optional, Sequence

CATLIST_13 = [
    '03001627', '02691156', '02828884', '02933112', '03211117', '03636649',
    '03691459', '04090263', '04256520', '04379243', '04530566', '02958343',
    '04401088',
]


def _build_parser() -> ArgumentParser:
    parser = ArgumentParser(description='Image_to_3D (TPU-native LIST)')
    # Device flags.  `--cuda`/`--gpu` are accepted for CLI compatibility with
    # the reference (arguments.py:6-7) but are no-ops: device selection is
    # JAX-native (TPU if present, else CPU).
    parser.add_argument('--cuda', type=bool, default=True)
    parser.add_argument('--gpu', type=int, default=0)
    parser.add_argument('--plot_every_batch', type=int, default=10)
    parser.add_argument('--save_every_epoch', type=int, default=25)
    parser.add_argument('--save_after_epoch', type=int, default=1)
    parser.add_argument('--test_every_epoch', type=int, default=25)
    parser.add_argument('--load_pretrain', type=bool, default=True)
    parser.add_argument('--skip_train', action='store_true')

    parser.add_argument('--viewnum', type=int, default=36)
    parser.add_argument('--img_res', type=int, default=224)
    parser.add_argument('--mcube_znum', type=int, default=128)
    parser.add_argument('--test_pointnum', type=int, default=65536)
    parser.add_argument('--chunk_s', type=int, default=0)
    parser.add_argument('--chunk_l', type=int, default=217)

    # Reference-parity no-ops (arguments.py defines them; no shipped
    # reference config reads them — cluster-array cruft): chunk_id/
    # chunk_num (the live sharding knobs are --chunk_s/--chunk_l),
    # cam_batch_size/cam_lr/cam_dir (the abandoned camera branch),
    # point_decoder, n_decoder_pos, test_batch_size (test runs per-shape;
    # see --infer_batch for the TPU-native batched sweep).
    parser.add_argument('--chunk_id', type=int, default=0,
                        help='accepted for reference CLI parity; inert')
    parser.add_argument('--chunk_num', type=int, default=4,
                        help='accepted for reference CLI parity; inert')

    # Required. Model & Dataset identifier (dotted path, see registry).
    parser.add_argument('--model', type=str, help='Dotted path of the model')
    parser.add_argument('--dataset', type=str, help='Dotted path of the dataset')

    # Data augmentation (reference: arguments.py:32-34)
    parser.add_argument('--random_h_flip', action='store_true')
    parser.add_argument('--color_jitter', action='store_true')
    parser.add_argument('--normalize', action='store_true')

    # Model components
    parser.add_argument('--point_decoder', action='store_true',
                        help='accepted for reference CLI parity; inert')
    parser.add_argument('--warm_start', action='store_true')

    parser.add_argument('--lr', type=float, default=0.0001)
    parser.add_argument('--beta1', type=float, default=0.9)
    parser.add_argument('--cam_batch_size', type=int, default=16,
                        help='accepted for reference CLI parity; inert')
    parser.add_argument('--cam_lr', type=float, default=0.00005,
                        help='accepted for reference CLI parity; inert')
    parser.add_argument('--train_batch_size', type=int, default=12)
    parser.add_argument('--test_batch_size', type=int, default=1,
                        help='accepted for reference CLI parity; inert '
                             '(the batched sweep knob is --infer_batch)')
    parser.add_argument('--epochs', type=int, default=300)
    parser.add_argument('--sampling_mode', type=str, default='weighted',
                        help='accepted for reference CLI parity; inert — '
                             'the reference never reads it either '
                             '(arguments.py:58): query mixing is governed '
                             'by --sample_distribution/--sigmas')
    parser.add_argument('--exp_name', '-e', type=str, default='d2im+tGCN')
    parser.add_argument('--eval_pred', action='store_true')
    parser.add_argument('--supervise_proj', action='store_true',
                        help='accepted for reference CLI parity; inert — '
                             'no shipped config supervises the learned '
                             'projection in the reference either')
    parser.add_argument('--coarse_point_density', type=int, default=10000)
    parser.add_argument('--sample_point_density', type=int, default=32768)
    parser.add_argument('--sdf_max_dist', type=float, default=1.0)
    parser.add_argument('--sdf_scale', type=float, default=1.0)

    parser.add_argument('--weight_decay', type=float, default=1e-5)
    parser.add_argument('--sigmas', type=float, nargs='+',
                        default=[0.003, 0.01, 0.07])
    parser.add_argument('--sample_distribution', type=float, nargs='+',
                        default=[0.5, 0.49, 0.01])

    parser.add_argument('--point_feat', type=int,
                        default=[128, 128, 256, 256, 256, 128, 128, 3],
                        nargs='+', help='Features for point decoder.')
    parser.add_argument('--point_degree', type=int,
                        default=[2, 2, 2, 2, 2, 2, 64], nargs='+',
                        help='Upsample degrees for point decoder.')
    parser.add_argument('--im_enc_layers', type=int,
                        default=[1, 1, 1, 1, 16, 32, 64, 128, 128], nargs='+',
                        help='Layer dimensions for the voxel encoder.')

    parser.add_argument('--n_decoder_pos', type=int, default=2,
                        help='accepted for reference CLI parity; inert')
    parser.add_argument('--bb_min', type=float, default=-0.5,
                        help='Bounding box minimum.')
    parser.add_argument('--bb_max', type=float, default=0.5,
                        help='Bounding box maximum.')
    parser.add_argument('--vox_res', type=int, default=128,
                        help='Bounding box res.')

    parser.add_argument('--data_dir', default='./Datasets/shapenet/')
    parser.add_argument('--mesh_dir', default='./Datasets/shapenet/mesh/')
    parser.add_argument('--h5_dir', default='./Datasets/shapenet/sampled_points/')
    parser.add_argument('--cam_dir', default='./Datasets/shapenet/images/',
                        help='accepted for reference CLI parity; unused')
    parser.add_argument('--image_dir', default='./Datasets/shapenet/images/')
    parser.add_argument('--catlist', type=str, default=list(CATLIST_13),
                        nargs='+', help='category list.')

    parser.add_argument('--output_dir', default='./results/')
    parser.add_argument('--test_cam_id', type=int, default=2,
                        help='Cam id to test with.')
    parser.add_argument('--test_gpu_id', type=int, default=0,
                        help='Accepted for compatibility; unused on TPU.')
    parser.add_argument('--test_checkpoint', default='best_model_test.ckpt')
    parser.add_argument('--testlist_file',
                        default='./data/DISN_split/testlist_all.lst')
    parser.add_argument('--split_dir', default='./data/DISN_split',
                        help='Directory holding <cat>_{train,test}.lst split '
                             'files (reference hard-codes ./data/DISN_split, '
                             'Datasets.py:72,180).')

    # ---- TPU-native additions (not present in the reference) ----
    parser.add_argument('--seed', type=int, default=333,
                        help='Global PRNG seed (reference seeds torch with 333).')
    parser.add_argument('--mesh_shape', type=int, nargs='+', default=None,
                        help='Device mesh shape, e.g. "--mesh_shape 8" for 8-way '
                             'data parallelism. Default: all local devices on one '
                             'data axis.')
    parser.add_argument('--dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='Accepted for config parity; currently a '
                             'NO-OP. The rebuild pins bf16 where it is '
                             'profitable AND safe (packed training '
                             'features via --vox_packed_dtype, the dense '
                             'decode compute path, the fetch wire via '
                             '--fetch_dtype) and keeps f32 elsewhere '
                             '(params, BN stats, projection coords).')
    parser.add_argument('--fast_grid', type=int, default=1,
                        help='Use the dense-grid gather-free SDF decode path '
                             'at inference (1) or the reference-style chunked '
                             'gather loop (0).')
    parser.add_argument('--fetch_dtype', type=str, default='bfloat16',
                        choices=['float32', 'bfloat16'],
                        help='Wire dtype of the dense SDF grid for the '
                             'device->host fetch (upcast to f32 on host). '
                             'bfloat16 halves host-link traffic; marching '
                             'cubes only interpolates near the zero '
                             'crossing, where bf16 keeps full relative '
                             'precision (vertex shift < 1e-4 world units, '
                             'far under the 0.005 eval threshold). '
                             'float32 restores a bit-exact fetch.')
    parser.add_argument('--fetch_mode', type=str, default='band',
                        choices=['grid', 'band'],
                        help='Dense-grid device->host wire format. "band" '
                             '(default) ships sign bits + exact values of '
                             'cells incident to a mixed marching-cubes '
                             'cube (~0.77 MB per 128^3 mesh vs 4.2 MB '
                             'bf16 grid) — the extracted mesh is '
                             'IDENTICAL to the full-grid fetch (marching '
                             'cubes reads only vertex classes plus values '
                             'on interpolated edges; ops/band.py), so the '
                             'inference sweep stays compute-bound even at '
                             'single-digit-MB/s host links. "grid" ships '
                             'the full wire grid (use when the raw SDF '
                             'field itself is the product).  Band applies '
                             'to the fast dense path; the chunked '
                             'fallback always ships the grid.')
    parser.add_argument('--infer_batch', type=int, default=1,
                        help='Meshes decoded per device dispatch in the test '
                             'sweep (dense path only). >1 amortizes the '
                             'encoder pass and per-slab fixed costs across '
                             'shapes (the reference decodes one shape per '
                             'dispatch, test.py:85-110); host meshing/eval '
                             'still runs per shape in the worker thread. '
                             'Measured on v5e (r3 A/B): B=4 runs 0.282 '
                             's/mesh vs 0.252 for the default per-mesh '
                             'pipeline (fetch overlap beats dispatch '
                             'amortization) — keep 1 unless dispatch '
                             'latency dominates your deployment.')
    parser.add_argument('--use_pallas', type=int, default=-1,
                        help='Dense-decode head: -1 (default) auto-selects '
                             'per resolution; 0 pure-XLA head; 1 per-scale '
                             't-major fused kernel (r2; loses to XLA on '
                             'v5e, 0.41 vs 0.21 per 128^3); 2 structured '
                             'split-parts fused head (fc_0 accumulation + '
                             'MLP tail in VMEM, no stack concat — beats '
                             'XLA 0.2122 vs 0.2136 at 128^3, r3 A/B). '
                             'Auto: 2 at vox_res<=192, 0 at larger (256^3 '
                             'measured faster on the XLA head). '
                             'Non-TPU backends always use XLA.')
    parser.add_argument('--percep_collapse', type=int, default=-1,
                        help='Dense-decode perceptual sampling: 1 gathers '
                             'ONE corner-collapsed row per query from a '
                             '4x-wide projected map (2D analog of '
                             '--collapse_samples; bitwise-equal output, '
                             'tests/test_dense_grid.py) instead of 4 '
                             'corner rows; 0 keeps the 4-corner batched '
                             'take. -1 (default) auto: ON with the fused '
                             'Pallas head, OFF with the XLA head — the '
                             'measured split (r5 on-chip A/B, 128^3: '
                             'fused 0.188 -> 0.175 s/decode WIN, XLA '
                             'slab-64 0.198 -> 0.244 LOSS).')
    parser.add_argument('--remat', type=int, default=1,
                        help='Rematerialize the voxel encoder in training to '
                             'trade FLOPs for HBM.')
    parser.add_argument('--remat_decode', type=int, default=-1,
                        help='Rematerialize the chunked training decode '
                             '(1) or keep its activations live (0); -1 '
                             'follows --remat. The decode backward under '
                             'remat re-streams the whole gather-index '
                             'fleet, and the step is index-streaming '
                             'bound; 0 is faster wherever the ~2.5 GB of '
                             'chunk activations fit (batch <= 4).')
    parser.add_argument('--fuse_sample_gathers', type=int, default=0,
                        help='Scales per fused gather op in the packed '
                             'training sampler: the train step is gather-'
                             'LATENCY bound (fixed per-gather-op index '
                             'copies dominate, see BASELINE.md roofline), '
                             'so batching N scales through one shared '
                             'flat buffer trades a (B, 8, N, 7*chunk, '
                             '128) transient for 1/N the gather ops. '
                             '0 (default) keeps per-scale 2-plane takes; '
                             '1 fuses the two z-planes of each scale '
                             'into ONE take (half the gather ops, no '
                             'cross-scale buffer). '
                             'Measured on v5e (r3 A/B): 1 is neutral at '
                             'batch 4 (1.405 vs 1.396 s/step) and wins '
                             'at batch 8 (3.769 vs 3.865 — the remat '
                             'decode re-streams the gather fleet, so op '
                             'count pays there); N=3 and N=6 CRASH the '
                             'XLA TPU compiler (remote-compile helper '
                             'exit 1); keep 0 or 1 on TPU. Exact '
                             'value+grad parity is tested on CPU.')
    parser.add_argument('--collapse_samples', type=str, default='auto',
                        help='Scale indices (comma list), "auto", or '
                             '"none": sample these pyramid scales from a '
                             'corner-COLLAPSED volume (z+1/y+1 neighbor '
                             'planes replicated into the row + overlapped '
                             'x windows) — ONE gathered row per '
                             'displacement tap instead of 8 corner rows, '
                             'at ~4x those scales\' feature bytes, built '
                             'once per step outside the decode chunk '
                             'loop. The train step is gather-issue bound; '
                             'measured per-chunk sampling f+b on v5e '
                             '(tools/probe_corner_collapse.py): 3.1x/'
                             '1.4x/2.7x/1.6x on scales 0/2/3/5; scale 1 '
                             '(16ch@128^3, 1.27 GB collapsed) loses in '
                             'full mode but WINS as halo ("1h": x window '
                             'only, 4 rows/tap, +19%% bytes). "auto" '
                             '(default) = the measured full-step winners '
                             '(tools/ab_train_collapse.py, same-session '
                             'v5e pairs): 0,2,3,5,1h at batch <= 4 '
                             '(1.201 vs 1.597 s/step collapse-off); '
                             '0,3,5,1h above (3.029 vs 4.100).')
    parser.add_argument('--collapse_select', type=int, default=0,
                        help='Collapsed-sampler extraction formulation: '
                             '0 (default) f32-weight einsum over the '
                             'gathered stack; 1 bf16 0/1-select einsums + '
                             'f32 lerp, so the wide stack is never upcast '
                             'to f32 (targets the ~0.07 s/step of f32 '
                             'layout copies in the r4 post-halo trace). '
                             'Exact select; f32 association differs. '
                             'Ships as an in-step A/B flag (the isolated '
                             'probe measured the SELECT form slower, '
                             'tools/probe_collapse_select.py, but the '
                             'layout copies do not reproduce outside the '
                             'step).')
    parser.add_argument('--fc0_dmajor', type=int, default=0,
                        help='Training sampler layout: 1 lays displaced '
                             'queries out tap-minor so each scale\'s '
                             'sample block reshapes to (B, N, 7*C) with '
                             'NO transpose, and permutes the fc_0 KERNEL '
                             'rows to compensate (exact; checkpoint-'
                             'compatible — ops/sampling.py '
                             'fc0_dmajor_perm). In-step A/B knob for the '
                             'per-scale sample relayout copies.')
    parser.add_argument('--remat_save_samples', type=int, default=0,
                        help='Under decode remat, save the named sampled '
                             'feature stacks instead of recomputing them: '
                             'the remat backward then skips the forward '
                             're-gather fleet at ~340 MB/chunk (vox bf16) '
                             '+ ~135 MB/chunk (percep f32) of extra live '
                             'HBM. 0 = full remat; 1 = save vox samples; '
                             '2 = save vox + percep.')
    parser.add_argument('--steps_per_dispatch', type=int, default=1,
                        help='Train steps run inside ONE jitted device '
                             'program (lax.scan over K stacked batches). '
                             'The per-step numerics are identical to K '
                             'single dispatches; the host/dispatch gap '
                             'between steps (0.25-0.65 s/step through the '
                             'harness relay, r4 trace) is paid once per K '
                             'steps instead of per step. Costs K-1 extra '
                             'batches of device memory (~38 MB each at '
                             'batch 4 x 128^3) and delays loss visibility '
                             'by K-1 steps. 1 disables. Incompatible with '
                             '--checkify (multi-step uses plain jit).')
    parser.add_argument('--sort_queries', type=int, default=0,
                        help='Sort training queries by voxel cell inside the '
                             'train step (points/values permuted together - '
                             'exact, the losses are permutation-invariant '
                             'sums). Measured on v5e: NO speedup (TPU '
                             'gather DMAs do not reward index locality; '
                             'the argsort costs ~0.2 s/step) - kept as an '
                             'off-by-default experiment.')
    parser.add_argument('--train_query_chunks', type=int, default=4,
                        help='Split the training query axis into this many '
                             'rematerialized chunks (numerically exact; the '
                             'full 3610-d first-layer activation at batch 8 '
                             'x 32441 queries OOMs a 16 GB chip). 1 disables.')
    parser.add_argument('--resnet_ckpt', type=str, default='',
                        help='torchvision ResNet18 state_dict (.pt/.pth/.npz)'
                             ' to initialize im_encoder/im_encoder2 from '
                             '(the reference uses ImageNet-pretrained '
                             'torchvision weights, modules.py:1030).')
    parser.add_argument('--mesh_renorm', type=str, default='reference',
                        choices=['reference', 'exact'],
                        help='Vertex renormalization of extracted meshes. '
                             '"reference" preserves the reference\'s '
                             'global-scalar quirk (utils.py:176-177: '
                             'v=(v-v.min())/v.max() over ALL coords) — '
                             'near-harmless for bbox-filling ShapeNet '
                             'shapes but it maps small centered '
                             'isosurfaces onto non-centered blobs '
                             '(measured IoU 0.508 vs 0.921 on an '
                             'analytic sphere grid). "exact" uses the '
                             'true grid-coordinate mapping.')
    parser.add_argument('--profile_dir', type=str, default='',
                        help='If set, write a jax.profiler trace here.')
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--multihost', type=int, default=0,
                        help='Join the JAX multi-controller runtime '
                             '(jax.distributed.initialize) before building '
                             'the device mesh: run the same command on '
                             'every host with COORDINATOR_ADDRESS/'
                             'NUM_PROCESSES/PROCESS_ID set (or rely on '
                             'cloud autodetection). The mesh then spans '
                             'hosts and eval test lists shard per process '
                             '(parallel/multihost.py; the reference\'s '
                             'manual analog is --chunk_s/--chunk_l, '
                             'test.py:108-113).')
    parser.add_argument('--coordinator_address', type=str, default='',
                        help='host:port of process 0 for --multihost '
                             '(default: $COORDINATOR_ADDRESS or cloud '
                             'autodetection).')
    parser.add_argument('--num_processes_dist', type=int, default=0,
                        help='Total process count for --multihost '
                             '(default: $NUM_PROCESSES or autodetect).')
    parser.add_argument('--process_id', type=int, default=-1,
                        help='This process\'s index for --multihost '
                             '(default: $PROCESS_ID or autodetect).')
    parser.add_argument('--checkify', action='store_true',
                        help='Enable jax.experimental.checkify NaN/inf guards '
                             'in the train step (debugging).')
    return parser


def _validate(args: Namespace) -> None:
    """Reject / warn on config values measured to crash the XLA TPU compiler
    (r3 A/B runs, see the flags' help text) — a clear parse-time error beats
    an opaque remote-compiler abort on real hardware."""
    fg = int(getattr(args, 'fuse_sample_gathers', 0))
    if fg not in (0, 1):
        raise ValueError(
            f'--fuse_sample_gathers {fg}: cross-scale fusion values >= 2 '
            'crash the XLA TPU compiler (measured on v5e: N=3 and N=6 -> '
            'remote-compile helper exit 1). Use 0 (per-scale takes) or 1 '
            '(per-scale z-plane fusion).')
    tqc = int(getattr(args, 'train_query_chunks', 4))
    if tqc < 1:
        raise ValueError(f'--train_query_chunks {tqc}: must be >= 1.')
    if tqc == 2 and int(getattr(args, 'train_batch_size', 0)) >= 8:
        import warnings
        warnings.warn(
            '--train_query_chunks 2 at train_batch_size >= 8 crashed the '
            'XLA TPU compiler in measurement (v5e, r3); use 4 chunks at '
            'batch 8.', RuntimeWarning, stacklevel=2)


def _finalize(args: Namespace) -> Namespace:
    """Derive testlist/dirs exactly like the reference (arguments.py:110-133)."""
    _validate(args)
    testlist = []
    if args.testlist_file and os.path.exists(args.testlist_file):
        with open(args.testlist_file, 'r') as f:
            lines = f.readlines()
        for l in lines[:30]:
            fn = l.strip()
            if fn:
                fn = fn.split(' ')
                if fn[0] in args.catlist:
                    testlist.append(
                        {'cat_id': fn[0], 'shape_id': fn[1], 'cam_id': fn[2]})
    args.testlist = testlist

    args.checkpoint_dir = args.output_dir + args.exp_name + '/checkpoints/'
    args.results_dir = args.output_dir + args.exp_name + '/'
    args.log = args.output_dir + args.exp_name + '/log.txt'
    return args


def get_args(argv: Optional[Sequence[str]] = None) -> Namespace:
    """Parse CLI args (pass ``argv`` for programmatic use)."""
    parser = _build_parser()
    args = parser.parse_args(argv)
    return _finalize(args)


def default_config(**overrides) -> Namespace:
    """Programmatic config with the same defaults as the CLI.

    ``overrides`` are applied before derived fields (testlist, dirs) are
    computed, so e.g. ``default_config(exp_name='t')`` affects the derived
    ``checkpoint_dir``.
    """
    parser = _build_parser()
    args = parser.parse_args([])
    for k, v in overrides.items():
        if not hasattr(args, k):
            raise ValueError(f'Unknown config field: {k}')
        setattr(args, k, v)
    return _finalize(args)
