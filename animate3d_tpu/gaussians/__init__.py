from animate3d_tpu.gaussians.state import GaussianState, BasicPointCloud  # noqa: F401
from animate3d_tpu.gaussians.ply import (  # noqa: F401
    read_gaussian_ply,
    write_gaussian_ply,
    load_gaussians,
)
