from .projector import (
    transform3d,
    intrinsic_matrix,
    pixel_scales,
    depth_to_point_cloud,
    camera_to_world,
    pixel_to_world,
    discretize_point_cloud,
    world_to_map_indices,
)
