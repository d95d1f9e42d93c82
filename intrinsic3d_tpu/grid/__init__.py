from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid  # noqa: F401
