"""flax.linen model zoo for the LIST capability surface."""

from list_tpu.models.resnet import ResEncoder, BasicBlock  # noqa: F401
from list_tpu.models.treegcn import TreeGCN, TreeGraphDecoder  # noqa: F401
from list_tpu.models.pointmlp import PointMLP  # noqa: F401
from list_tpu.models.percep import PerceptualPooling  # noqa: F401
from list_tpu.models.voxel import (  # noqa: F401
    VoxelEncoder2, VoxelDecoder2, sample_multiscale, make_displacements)
from list_tpu.models.list_model import (  # noqa: F401
    CoarseNet, LIST, SpatialTransformer,
    DEFAULT_POINT_FEAT, DEFAULT_POINT_DEGREE, DEFAULT_IM_ENC_LAYERS)
