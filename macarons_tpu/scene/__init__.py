"""Scene state & runtime: masked voxel grids, proxy fields, embodied camera."""
