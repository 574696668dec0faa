"""Depth-conditioned per-pixel ray shooting, pure JAX.

Replaces the reference's modified PyTorch3D raysampler
(utils/ray_utils.py:128-212,215-379 + the flipped-sign pixel grid built at
view_attn_efficient2.py:279-293): one ray per latent pixel, with
caller-supplied per-pixel view-space depths as the sample lengths.

The whole machinery reduces to: unproject the NDC pixel grid at z=1 and z=2,
take the difference as the ray direction (so that ||dir||_z == 1 in view
space, making `length` the view-space depth), origin = plane1 - dir (the
z=0 plane), points = origin + dir * length.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mvdfusion_tpu.geometry.cameras import Cameras, unproject_points


class RayGrid(NamedTuple):
    """Per-pixel rays for a batch of cameras.

    origins:    (B, H, W, 3) world-space ray origins (on the z=0 view plane)
    directions: (B, H, W, 3) world-space directions (z-depth-normalised, NOT
                unit length — matches ray_utils.py:199-205 unit_directions=False)
    xys:        (H, W, 2) the NDC pixel grid
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    xys: jnp.ndarray


def ndc_pixel_grid(height: int, width: int) -> np.ndarray:
    """The reference's flipped-sign NDC pixel grid (H, W, 2).

    x runs 1-1/W -> -1+1/W across columns, y runs 1-1/H -> -1+1/H down rows
    (view_attn_efficient2.py:281-289: min_x = 1-half_pix, max_x = -1+half_pix;
    PyTorch3D NDC has +x left / +y up, so screen-left column gets +x).
    """
    half_x = 1.0 / width
    half_y = 1.0 / height
    xs = np.linspace(1.0 - half_x, -1.0 + half_x, width, dtype=np.float32)
    ys = np.linspace(1.0 - half_y, -1.0 + half_y, height, dtype=np.float32)
    y, x = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([x, y], axis=-1)


def pixel_rays(cams: Cameras, height: int, width: int) -> RayGrid:
    """Shoot one ray per NDC pixel for every camera (ray_utils.py:128-212)."""
    xy = jnp.asarray(ndc_pixel_grid(height, width)).reshape(1, height * width, 2)
    B = len(cams)
    xy = jnp.broadcast_to(xy, (B, height * width, 2))
    p1 = unproject_points(cams, jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1))
    p2 = unproject_points(cams, jnp.concatenate([xy, 2.0 * jnp.ones_like(xy[..., :1])], axis=-1))
    directions = p2 - p1
    origins = p1 - directions
    return RayGrid(
        origins=origins.reshape(B, height, width, 3),
        directions=directions.reshape(B, height, width, 3),
        xys=xy.reshape(B, height, width, 2)[0],
    )


def rays_to_points(rays: RayGrid, lengths: jnp.ndarray) -> jnp.ndarray:
    """Points = origin + dir * length.

    lengths: (B, H, W, D) view-space depths -> (B, H, W, D, 3) world points
    (utils/ray_utils.py:68-99 ray_bundle_to_ray_points).
    """
    return rays.origins[..., None, :] + rays.directions[..., None, :] * lengths[..., None]


def plucker_coords(origins: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Plücker (d, o x d) per ray; inputs broadcastable [..., 3] -> [..., 6].

    Matches view_attn_efficient2.py:207-213 (_encode_plucker pre-harmonic).
    """
    origins = jnp.broadcast_to(origins, directions.shape)
    return jnp.concatenate([directions, jnp.cross(origins, directions)], axis=-1)
