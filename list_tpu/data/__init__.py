"""Host-side data pipeline: ShapeNet, Pix3D, synthetic micro-dataset."""

from list_tpu.data.shapenet import (  # noqa: F401
    IM2PointFarthest, IM2SDF, quantize_occupancy, read_shape_ids)
from list_tpu.data.pix3d import Pix3D  # noqa: F401
from list_tpu.data.synthetic import (  # noqa: F401
    SyntheticSDFDataset, SyntheticShape, generate_synthetic_shapenet)
from list_tpu.data.loader import DataLoader, collate  # noqa: F401
from list_tpu.data.transforms import ImageTransform, to_float  # noqa: F401
