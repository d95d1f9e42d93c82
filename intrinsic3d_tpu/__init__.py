"""intrinsic3d_tpu — TPU-native joint appearance & geometry RGB-D reconstruction.

A from-scratch JAX/XLA/Pallas re-design of the Intrinsic3D pipeline
(Maier et al., ICCV 2017; reference implementation NVlabs/intrinsic3d):
blur-based keyframe selection, TSDF fusion into a sparse voxel SDF, and
double coarse-to-fine joint optimization of voxel SDF + albedo, camera
poses/intrinsics/distortion and spatially-varying SH lighting.
"""

__version__ = "0.1.0"

from intrinsic3d_tpu.config import Settings  # noqa: F401
from intrinsic3d_tpu.camera import Camera  # noqa: F401
