"""list_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for single-view
implicit 3D reconstruction, providing the full capability surface of the LIST
reference (robotic-vision-lab/Learning-Implicitly-From-Spatial-Transformers-Network,
ICCV'23): two-stage CoarseNet -> LIST training, dense-grid SDF inference with
marching-cubes mesh extraction, and the Chamfer/F-score/IoU evaluation suite.

Layer map (TPU-first redesign of the reference's flat research layout):

  list_tpu.ops       — pure-JAX geometry/compute primitives (grid_sample parity,
                       voxelization-as-quantization, chamfer, FPS, losses) and
                       Pallas TPU kernels for the hot SDF-decode path.
  list_tpu.models    — flax.linen modules: ResNet18 encoder (stride-1 conv1),
                       TreeGCN graph decoder, PointMLP, VoxelEncoder/Decoder,
                       PerceptualPooling, and the CoarseNet / LIST models.
  list_tpu.parallel  — jax.sharding Mesh construction + NamedSharding specs for
                       data-parallel training and query-sharded inference.
  list_tpu.data      — host-side dataset pipeline (ShapeNet IM2SDF /
                       IM2PointFarthest, Pix3D, synthetic micro-dataset).
  list_tpu.train     — executors, jitted train steps, checkpoint families,
                       warm-start + freezing, drivers.
  list_tpu.infer     — chunked/sharded dense-grid SDF evaluation and mesh
                       extraction.
  list_tpu.eval      — eval_pointcloud / eval_mesh metric parity and the
                       implicit-waterproofing IoU.
  list_tpu.native    — C++ extension (spatial-hash inside/outside tests,
                       marching cubes, KD-tree NN, BVH signed distance) with
                       pure-NumPy fallbacks.
  list_tpu.utils     — mesh IO, logging, experiment bookkeeping.
"""

__version__ = "0.1.0"

from list_tpu.config import get_args, default_config  # noqa: F401
from list_tpu.registry import get_class  # noqa: F401
