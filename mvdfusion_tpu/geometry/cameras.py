"""Perspective cameras in the PyTorch3D convention, as a JAX pytree.

The reference leans on PyTorch3D's C++/CUDA camera stack
(utils/camera_utils.py, pytorch3d.renderer.PerspectiveCameras). Here the
same math is expressed as pure jnp functions over a `Cameras` NamedTuple so
cameras flow through jit/vmap/shard_map like any other array.

Convention summary (must match PyTorch3D exactly — sign bugs here produce
plausible-but-wrong renders):
  * Row-vector rotations: X_view = X_world @ R + T.
  * Camera center C = -T @ R^T.
  * NDC intrinsics: x_ndc = fx * x_view / z_view + px (+x points LEFT in
    screen space, +y up — hence the negated xy at every grid-sample site,
    reference view_attn_efficient2.py:236,311).
  * unproject(from_ndc=True) takes (x_ndc, y_ndc, depth) with depth the
    view-space z coordinate.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class Cameras(NamedTuple):
    """Batch of perspective cameras (PyTorch3D convention).

    R: (B, 3, 3) row-vector rotation, T: (B, 3) translation,
    focal_length: (B, 2) NDC focal, principal_point: (B, 2) NDC principal.
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray

    def __len__(self) -> int:
        return self.R.shape[0]


def make_cameras(R, T, focal_length, principal_point=None) -> Cameras:
    R = jnp.asarray(R, jnp.float32)
    T = jnp.asarray(T, jnp.float32)
    B = R.shape[0]
    f = jnp.broadcast_to(jnp.asarray(focal_length, jnp.float32), (B, 2))
    if principal_point is None:
        c = jnp.zeros((B, 2), jnp.float32)
    else:
        c = jnp.broadcast_to(jnp.asarray(principal_point, jnp.float32), (B, 2))
    return Cameras(R=R, T=T, focal_length=f, principal_point=c)


def camera_slice(cams: Cameras, indices) -> Cameras:
    """Index a camera batch (utils/camera_utils.py:14-31)."""
    if isinstance(indices, (list, tuple)):
        indices = jnp.asarray(indices)
    return Cameras(
        R=cams.R[indices],
        T=cams.T[indices],
        focal_length=cams.focal_length[indices],
        principal_point=cams.principal_point[indices],
    )


def concat_cameras(camera_list: Sequence[Cameras]) -> Cameras:
    """Concatenate camera batches (utils/camera_utils.py:33-56)."""
    return Cameras(
        R=jnp.concatenate([c.R for c in camera_list]),
        T=jnp.concatenate([c.T for c in camera_list]),
        focal_length=jnp.concatenate([c.focal_length for c in camera_list]),
        principal_point=jnp.concatenate([c.principal_point for c in camera_list]),
    )


def camera_center(cams: Cameras) -> jnp.ndarray:
    """World-space camera centers C = -T @ R^T, shape (B, 3)."""
    return -jnp.einsum("bj,bkj->bk", cams.T, cams.R, precision="highest")


def world_to_view(cams: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """X_view = X_world @ R + T.  points: (B, N, 3) -> (B, N, 3)."""
    return jnp.einsum("bnj,bjk->bnk", points, cams.R, precision="highest") + cams.T[:, None, :]


def view_to_world(cams: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """Inverse of world_to_view: (X_view - T) @ R^T."""
    return jnp.einsum("bnj,bkj->bnk", points - cams.T[:, None, :], cams.R, precision="highest")


def transform_points_ndc(cams: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """Project world points to NDC, shape-preserving over (B, N, 3).

    Returns (x_ndc, y_ndc, 1/z_view), matching PyTorch3D's
    transform_points_ndc (used at view_attn_efficient2.py:303,321).
    `points` may have a leading camera batch of 1 to broadcast shared points
    across all cameras (reference passes shape (1, B*H*W*D, 3)).
    """
    if points.shape[0] == 1 and cams.R.shape[0] != 1:
        points = jnp.broadcast_to(points, (cams.R.shape[0],) + points.shape[1:])
    xv = world_to_view(cams, points)
    z = xv[..., 2:3]
    xy_ndc = cams.focal_length[:, None, :] * xv[..., :2] / z + cams.principal_point[:, None, :]
    return jnp.concatenate([xy_ndc, 1.0 / z], axis=-1)


def unproject_points(cams: Cameras, xy_depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject NDC xy at view-space depth z to WORLD points.

    xy_depth: (B, N, 3) = (x_ndc, y_ndc, z_view). Matches PyTorch3D
    `unproject_points(..., from_ndc=True)` (used via utils/ray_utils.py:192).
    """
    xy = xy_depth[..., :2]
    z = xy_depth[..., 2:3]
    xy_view = (xy - cams.principal_point[:, None, :]) * z / cams.focal_length[:, None, :]
    view = jnp.concatenate([xy_view, z], axis=-1)
    return view_to_world(cams, view)


def relative_cameras(cams: Cameras, query_idx) -> Cameras:
    """Re-express all cameras relative to the query camera's rotation.

    Matches utils/camera_utils.py:58-115 with center_at_origin=False (the
    call used in prepare_batch, viewfusion_zero_depth_rgb.py:237): the
    composed transform is x @ (Rq^T Ri) + Ti, i.e. R_i <- Rq^T @ R_i with T
    unchanged.
    """
    if isinstance(query_idx, (list, tuple)):
        query_idx = jnp.asarray(query_idx)
    Rq = cams.R[query_idx]  # (Q, 3, 3); reference uses a length-1 query
    if Rq.ndim == 3:
        Rq = Rq[0]
    R_rel = jnp.einsum("ji,bjk->bik", Rq, cams.R, precision="highest")  # Rq^T @ R_i per camera
    return Cameras(
        R=R_rel,
        T=cams.T,
        focal_length=cams.focal_length,
        principal_point=cams.principal_point,
    )


def normalize_cameras(cams: Cameras, distance: float = 3.5) -> Cameras:
    """Rescale camera centers to mean `distance` from origin
    (utils/camera_utils.py:117-144, look_at_optical_center=False)."""
    cam_dist_mean = jnp.mean(jnp.linalg.norm(camera_center(cams), axis=1))
    scale = distance / cam_dist_mean
    return cams._replace(T=cams.T * scale)


# ---------------------------------------------------------------------------
# look_at rig construction (host-side, numpy): replaces
# pytorch3d.renderer.cameras.look_at_view_transform for the dataset rigs
# (dataset/gso_test.py:116-149, dataset/objaverse.py:191-225).
# ---------------------------------------------------------------------------


def camera_position_from_spherical_angles(dist, elev, azim, degrees: bool = True) -> np.ndarray:
    """PyTorch3D spherical camera position: x = d ce sa, y = d se, z = d ce ca."""
    dist = np.asarray(dist, np.float64)
    elev = np.asarray(elev, np.float64)
    azim = np.asarray(azim, np.float64)
    if degrees:
        elev = np.deg2rad(elev)
        azim = np.deg2rad(azim)
    x = dist * np.cos(elev) * np.sin(azim)
    y = dist * np.sin(elev)
    z = dist * np.cos(elev) * np.cos(azim)
    return np.stack(np.broadcast_arrays(x, y, z), axis=-1)


def look_at_rotation(camera_position: np.ndarray, at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """PyTorch3D look_at_rotation (row-vector R = [x|y|z] columns)."""
    camera_position = np.atleast_2d(np.asarray(camera_position, np.float64))
    at = np.broadcast_to(np.asarray(at, np.float64), camera_position.shape)
    up = np.broadcast_to(np.asarray(up, np.float64), camera_position.shape)

    def _norm(v):
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n, 1e-5)

    z_axis = _norm(at - camera_position)
    x_axis = _norm(np.cross(up, z_axis))
    y_axis = _norm(np.cross(z_axis, x_axis))
    # handle up parallel to z (pytorch3d replaces x with normalize(cross(y, z)))
    degenerate = np.isclose(x_axis, 0.0, atol=5e-3).all(axis=-1, keepdims=True)
    x_replacement = _norm(np.cross(y_axis, z_axis))
    x_axis = np.where(degenerate, x_replacement, x_axis)
    R = np.stack([x_axis, y_axis, z_axis], axis=-1)  # columns are axes
    return R


def look_at_view_transform(
    dist=1.0, elev=0.0, azim=0.0, up=(0.0, 1.0, 0.0), at=(0.0, 0.0, 0.0), eye=None, degrees=True
):
    """R, T such that X_view = X_world @ R + T (PyTorch3D semantics)."""
    if eye is not None:
        C = np.atleast_2d(np.asarray(eye, np.float64))
    else:
        C = camera_position_from_spherical_angles(dist, elev, azim, degrees=degrees)
        C = np.atleast_2d(C)
    R = look_at_rotation(C, at=at, up=up)
    T = -np.einsum("bij,bj->bi", np.transpose(R, (0, 2, 1)), C)
    return R.astype(np.float32), T.astype(np.float32)
