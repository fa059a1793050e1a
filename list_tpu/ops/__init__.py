"""Pure-JAX compute primitives and Pallas TPU kernels."""

from list_tpu.ops.grid import (  # noqa: F401
    create_grid_points_from_bounds,
    sample_grid_points,
    voxel_indices,
    voxelize,
    reorder_and_scale_query,
)
from list_tpu.ops.sampling import (  # noqa: F401
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear_align_corners,
)
from list_tpu.ops.losses import (  # noqa: F401
    sdf_loss,
    occupancy_loss,
    chamfer_distance,
    chamfer_loss,
)
from list_tpu.ops.fps import (  # noqa: F401
    farthest_point_sampling,
    sample_farthest_points,
)
