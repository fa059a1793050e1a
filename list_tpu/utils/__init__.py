"""Host-side utilities: mesh types/IO, mesh extraction, logging."""

from list_tpu.utils.meshio import (  # noqa: F401
    Mesh, load_mesh, load_obj, load_ply, write_obj, write_ply,
    make_box, make_icosphere)
from list_tpu.utils.meshing import (  # noqa: F401
    generate_mesh, generate_scaled_mesh, render_grid_occupancy, save_volume)
from list_tpu.utils.logging import (  # noqa: F401
    print_log, SummaryWriter, write_scores_csv, snapshot_experiment, Timer)
