from mvdfusion_tpu.geometry.cameras import (
    Cameras,
    camera_center,
    camera_slice,
    concat_cameras,
    look_at_view_transform,
    make_cameras,
    normalize_cameras,
    relative_cameras,
    transform_points_ndc,
    unproject_points,
)
from mvdfusion_tpu.geometry.gridsample import grid_sample
from mvdfusion_tpu.geometry.harmonics import harmonic_embed, harmonic_output_dim
from mvdfusion_tpu.geometry.rays import RayGrid, ndc_pixel_grid, pixel_rays, plucker_coords, rays_to_points

__all__ = [
    "Cameras",
    "camera_center",
    "camera_slice",
    "concat_cameras",
    "look_at_view_transform",
    "make_cameras",
    "normalize_cameras",
    "relative_cameras",
    "transform_points_ndc",
    "unproject_points",
    "grid_sample",
    "harmonic_embed",
    "harmonic_output_dim",
    "RayGrid",
    "ndc_pixel_grid",
    "pixel_rays",
    "plucker_coords",
    "rays_to_points",
]
