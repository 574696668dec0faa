"""Camera / ray / grid-sample math, golden-tested against torch where the
reference used a native torch/CUDA op, and against closed-form properties
where it used PyTorch3D (not installed here — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mvdfusion_tpu.geometry import (
    camera_center,
    grid_sample,
    harmonic_embed,
    harmonic_output_dim,
    look_at_view_transform,
    make_cameras,
    ndc_pixel_grid,
    pixel_rays,
    plucker_coords,
    rays_to_points,
    relative_cameras,
    transform_points_ndc,
    unproject_points,
)
from mvdfusion_tpu.ops.image import area_downsample, bicubic_resize, nearest_upsample2x


def _random_cameras(rng, n=4, dist=1.5):
    azim = rng.uniform(0, 360, size=n)
    elev = rng.uniform(-60, 60, size=n)
    R, T = look_at_view_transform(dist=dist, elev=elev, azim=azim)
    return make_cameras(R, T, focal_length=(2.1875, 2.1875))


def test_look_at_simple_case():
    # camera at (0,0,1.5) looking at origin, y-up
    R, T = look_at_view_transform(dist=1.5, elev=0.0, azim=0.0)
    C = -(T @ R[0].T)  # row-vector center
    np.testing.assert_allclose(C[0], [0, 0, 1.5], atol=1e-6)
    # world origin must be 1.5 in front of the camera (+z view)
    np.testing.assert_allclose(T[0], [0, 0, 1.5], atol=1e-6)
    # R orthonormal
    np.testing.assert_allclose(R[0] @ R[0].T, np.eye(3), atol=1e-6)


def test_camera_center(rng):
    cams = _random_cameras(rng)
    C = np.asarray(camera_center(cams))
    np.testing.assert_allclose(np.linalg.norm(C, axis=1), 1.5, atol=1e-5)
    # center projects to view-space origin
    view = np.einsum("bj,bjk->bk", C, np.asarray(cams.R)) + np.asarray(cams.T)
    np.testing.assert_allclose(view, 0, atol=1e-5)


def test_project_unproject_roundtrip(rng):
    cams = _random_cameras(rng)
    pts = jnp.asarray(rng.normal(scale=0.3, size=(4, 64, 3)), jnp.float32)
    ndc = transform_points_ndc(cams, pts)
    # reconstruct depth z from 1/z and unproject
    xy_depth = jnp.concatenate([ndc[..., :2], 1.0 / ndc[..., 2:3]], axis=-1)
    rec = unproject_points(cams, xy_depth)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), atol=1e-4)


def test_shared_points_broadcast(rng):
    cams = _random_cameras(rng)
    pts = jnp.asarray(rng.normal(scale=0.3, size=(1, 64, 3)), jnp.float32)
    ndc = transform_points_ndc(cams, pts)
    assert ndc.shape == (4, 64, 3)


def test_relative_cameras_preserves_projection(rng):
    """Relative reframing is a rigid world rotation: projections of
    correspondingly-rotated points are identical (camera_utils.py:58-115)."""
    cams = _random_cameras(rng)
    rel = relative_cameras(cams, query_idx=[0])
    # query camera's new rotation is identity
    np.testing.assert_allclose(np.asarray(rel.R[0]), np.eye(3), atol=1e-5)
    pts = jnp.asarray(np.random.default_rng(1).normal(scale=0.3, size=(1, 32, 3)), jnp.float32)
    # world points rotate by Rq^{-1} applied on the right: x' = x @ Rq
    # since x' @ (Rq^T R) = x @ R  requires x' = x @ Rq... verify:
    Rq = np.asarray(cams.R[0])
    pts_rot = jnp.asarray(np.asarray(pts) @ Rq[None], jnp.float32)
    a = transform_points_ndc(cams, pts)
    b = transform_points_ndc(rel, pts_rot)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pixel_grid_matches_reference_convention():
    g = ndc_pixel_grid(4, 4)
    half = 1.0 / 4
    # top-left (row 0, col 0) = (+x, +y) extreme (flipped-sign grid)
    np.testing.assert_allclose(g[0, 0], [1 - half, 1 - half], atol=1e-6)
    np.testing.assert_allclose(g[-1, -1], [-1 + half, -1 + half], atol=1e-6)


def test_rays_depth_semantics(rng):
    """A ray point at length d must sit at view-space depth exactly d."""
    cams = _random_cameras(rng)
    rays = pixel_rays(cams, 8, 8)
    depths = jnp.full((4, 8, 8, 2), 1.5)
    pts = rays_to_points(rays, depths)  # (4,8,8,2,3)
    flat = pts.reshape(4, -1, 3)
    view = np.einsum("bnj,bjk->bnk", np.asarray(flat), np.asarray(cams.R)) + np.asarray(cams.T)[:, None]
    np.testing.assert_allclose(view[..., 2], 1.5, atol=1e-4)
    # and its NDC xy must be the originating pixel's grid coords
    ndc = transform_points_ndc(cams, flat)
    grid = np.asarray(rays.xys).reshape(-1, 2)
    grid = np.repeat(grid, 2, axis=0)[None].repeat(4, axis=0)
    np.testing.assert_allclose(np.asarray(ndc[..., :2]), grid, atol=1e-4)


def test_grid_sample_vs_torch(rng):
    feat = rng.normal(size=(3, 16, 16, 8)).astype(np.float32)
    xy = rng.uniform(-1.3, 1.3, size=(3, 100, 2)).astype(np.float32)  # includes out-of-range
    ours = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    ref = F.grid_sample(
        torch.from_numpy(feat).permute(0, 3, 1, 2),
        torch.from_numpy(xy).unsqueeze(2),
        align_corners=True,
        mode="bilinear",
        padding_mode="border",
    )[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_harmonic_embed_layout(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    out = np.asarray(harmonic_embed(jnp.asarray(x), n_harmonic=7, omega0=0.1))
    assert out.shape == (5, harmonic_output_dim(3))
    freqs = (2.0 ** np.arange(7)) * 0.1
    xf = (x[..., None] * freqs).reshape(5, -1)
    ref = np.concatenate([np.sin(xf), np.cos(xf), x], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_plucker(rng):
    o = rng.normal(size=(4, 1, 3)).astype(np.float32)
    d = rng.normal(size=(4, 10, 3)).astype(np.float32)
    p = np.asarray(plucker_coords(jnp.asarray(o), jnp.asarray(d)))
    np.testing.assert_allclose(p[..., :3], d, atol=1e-6)
    np.testing.assert_allclose(p[..., 3:], np.cross(np.broadcast_to(o, d.shape), d), atol=1e-6)


def test_area_downsample_vs_torch(rng):
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(area_downsample(jnp.asarray(x), 8))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.125, mode="area")
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_nearest_upsample_vs_torch(rng):
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(nearest_upsample2x(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=0)


def test_bicubic_vs_torch(rng):
    x = rng.normal(size=(2, 17, 17, 3)).astype(np.float32)
    ours = np.asarray(bicubic_resize(jnp.asarray(x), 224, 224))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(224, 224), mode="bicubic", align_corners=True
    )
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_grid_sample_mxu_matches_gather(rng):
    from mvdfusion_tpu.geometry.gridsample import grid_sample_mxu

    feat = rng.normal(size=(3, 16, 16, 8)).astype(np.float32)
    xy = rng.uniform(-1.3, 1.3, size=(3, 100, 2)).astype(np.float32)
    a = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    b = np.asarray(grid_sample_mxu(jnp.asarray(feat), jnp.asarray(xy)))
    np.testing.assert_allclose(a, b, atol=1e-5)
