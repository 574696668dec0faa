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


# ---------------------------------------------------------------------------
# Analytic end-to-end convention validation (SURVEY §7 hard part (b)).
#
# The property tests above check each geometry op in isolation; a SHARED
# misreading of the PyTorch3D conventions (ray_utils.py:128-212, the
# flipped-sign grid at view_attn_efficient2.py:281-289, the negated xy at
# :310-316) could survive all of them. These two tests close that hole:
#  * an ORIENTATION ANCHOR ties array coordinates to physical space (a
#    sphere at world +x must land on the image's right half), which a
#    globally mirrored convention — invisible to round-trip tests — fails;
#  * a full A->B WARP through the exact chain GridAttn uses (pixel_rays ->
#    rays_to_points at ground-truth depth -> transform_points_ndc ->
#    negated-xy grid_sample) must photometrically reconstruct view A, and
#    the test ALSO asserts that every single-sign mutation of the gather
#    convention breaks the reconstruction (mutation-verified power).
# ---------------------------------------------------------------------------


def _render_spheres(cams, H, W, centers, radii, colors):
    """Analytic Lambertian sphere render: exact RGB + exact view-space depth.

    Ray param t IS view-space depth because pixel_rays directions are
    z-depth-normalised (geometry/rays.py docstring)."""
    rays = pixel_rays(cams, H, W)
    o = np.asarray(rays.origins, np.float64)
    d = np.asarray(rays.directions, np.float64)
    V = o.shape[0]
    t_best = np.full((V, H, W), np.inf)
    hit = np.full((V, H, W), -1, np.int32)
    a = np.sum(d * d, axis=-1)
    for k in range(len(radii)):
        oc = o - centers[k]
        b = 2.0 * np.sum(d * oc, axis=-1)
        cc = np.sum(oc * oc, axis=-1) - radii[k] ** 2
        disc = b * b - 4.0 * a * cc
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = (-b - sq) / (2.0 * a)
        ok = (disc > 0.0) & (t > 1e-3) & (t < t_best)
        t_best = np.where(ok, t, t_best)
        hit = np.where(ok, k, hit)
    mask = hit >= 0
    depth = np.where(mask, t_best, 10.0)
    light = np.asarray([0.5, 1.0, 0.3])
    light = light / np.linalg.norm(light)
    pts = o + d * depth[..., None]
    img = np.ones((V, H, W, 3))
    for k in range(len(radii)):
        sel = hit == k
        if not sel.any():
            continue
        n = (pts[sel] - centers[k]) / radii[k]
        lam = np.maximum(n @ light, 0.0)
        img[sel] = colors[k] * (0.35 + 0.65 * lam[:, None])
    return img.astype(np.float32), depth.astype(np.float32), mask


def test_world_orientation_anchor():
    """Array<->world orientation, anchored to physical reasoning rather than
    to our own reading of the convention: a camera at azim=0/elev=0 sits at
    (0,0,d) looking along -z with +y up, so its right hand is world +x.
    PyTorch3D NDC has +x screen-LEFT, the grid's column 0 carries
    x_ndc=+1-1/W, hence world +x must land at LARGE column indices (right
    half); world +y at SMALL row indices (top half). Catches a globally
    mirrored convention that internal round-trips cannot see."""
    R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    cams = make_cameras(R, T, (2.1875, 2.1875))
    H, W = 40, 56
    one = np.asarray([[0.9, 0.1, 0.1]])
    for center, axis in [((0.4, 0.0, 0.0), "col"), ((0.0, 0.4, 0.0), "row")]:
        _, _, mask = _render_spheres(cams, H, W, np.asarray([center]), np.asarray([0.15]), one)
        assert mask[0].any(), "anchor sphere out of frame"
        ys, xs = np.nonzero(mask[0])
        if axis == "col":
            assert xs.mean() > W / 2 + 2, "world +x must appear on the image RIGHT"
        else:
            assert ys.mean() < H / 2 - 2, "world +y must appear on the image TOP"
    # azimuth sweep: increasing azimuth orbits the camera from +z toward +x
    # (camera_position_from_spherical_angles), so a fixed +x sphere drifts
    # toward image center then to the LEFT half as the camera passes it.
    R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=120.0)
    cams2 = make_cameras(R, T, (2.1875, 2.1875))
    _, _, mask2 = _render_spheres(cams2, H, W, np.asarray([(0.4, 0.0, 0.0)]), np.asarray([0.15]), one)
    ys2, xs2 = np.nonzero(mask2[0])
    assert xs2.mean() < W / 2 - 2, "after the camera orbits past +x the sphere must flip sides"


def test_analytic_reprojection_photometric():
    """Warp view A into view B through the exact GridAttn chain at ground
    truth depth and demand photometric reconstruction; then demand that
    every single-sign mutation of the gather convention FAILS. Non-square
    images pin the repo's own H/W-independent [-1,1] grid convention (the
    reference only ever runs square latents)."""
    from mvdfusion_tpu.geometry.cameras import camera_slice
    from mvdfusion_tpu.geometry.gridsample import grid_sample_mxu

    centers = np.asarray([[0.15, 0.05, -0.1], [-0.2, 0.1, 0.15], [0.0, -0.18, 0.05]])
    radii = np.asarray([0.22, 0.18, 0.20])
    colors = np.asarray([[0.9, 0.15, 0.15], [0.15, 0.6, 0.9], [0.95, 0.75, 0.1]])
    H, W = 48, 64
    pairs = [(0.0, 30.0, 30.0, 30.0), (90.0, 30.0, 150.0, -10.0), (200.0, 45.0, 240.0, 20.0)]
    for azA, elA, azB, elB in pairs:
        R, T = look_at_view_transform(dist=1.8, elev=[elA, elB], azim=[azA, azB])
        cams = make_cameras(R, T, (2.1875, 2.1875))
        img, depth, mask = _render_spheres(cams, H, W, centers, radii, colors)
        camA = camera_slice(cams, [0])
        camB = camera_slice(cams, [1])

        raysA = pixel_rays(camA, H, W)
        pts = rays_to_points(raysA, jnp.asarray(depth[:1, :, :, None]))  # (1,H,W,1,3)
        pts_flat = pts.reshape(1, H * W, 3)
        ndcB = np.asarray(transform_points_ndc(camB, pts_flat))  # (1,N,3)
        zB = 1.0 / ndcB[0, :, 2]

        imgB = jnp.asarray(img[1:2])
        depB = jnp.asarray(depth[1:2, :, :, None])
        xy = jnp.asarray(ndcB[:, :, :2])

        # visibility: the point must land in B's frame and B's rendered depth
        # there must agree with the point's analytic view-space z (occlusion
        # + silhouette-edge rejection — both are exact quantities here)
        dB = np.asarray(grid_sample(depB, -xy))[0, :, 0]
        inb = (np.abs(ndcB[0, :, 0]) < 1.0 - 2.0 / W) & (np.abs(ndcB[0, :, 1]) < 1.0 - 2.0 / H)
        visible = mask[0].reshape(-1) & inb & (np.abs(dB - zB) < 0.02) & (zB > 0)
        frac = visible.sum() / max(mask[0].sum(), 1)
        assert frac > 0.15, f"co-visible fraction degenerate ({frac:.2f}) — projection is off"

        tgt = img[0].reshape(-1, 3)[visible]
        for sampler in (grid_sample, grid_sample_mxu):
            got = np.asarray(sampler(imgB, -xy))[0][visible]
            err = np.abs(got - tgt).mean()
            assert err < 0.03, f"correct warp reconstruction error {err:.4f}"

        # mutation power: each single convention flip must break the warp
        muts = {
            "no_negation": xy,
            "flip_x_only": jnp.stack([xy[..., 0], -xy[..., 1]], axis=-1),
            "flip_y_only": jnp.stack([-xy[..., 0], xy[..., 1]], axis=-1),
            "swapped_xy": jnp.stack([-xy[..., 1], -xy[..., 0]], axis=-1),
        }
        for name, mxy in muts.items():
            got = np.asarray(grid_sample(imgB, mxy))[0][visible]
            err_m = np.abs(got - tgt).mean()
            assert err_m > 0.12, f"mutation {name} not detected (err {err_m:.4f}) at pair {azA},{azB}"
