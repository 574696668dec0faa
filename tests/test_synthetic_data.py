"""The synthetic RGB-D dataset: contract, and geometric self-consistency
through the SAME unproject->reproject->grid_sample chain GridAttn runs
(nn/viewattn.py:205-245) — a wrong sign convention in the renderer or the
camera stack breaks the cross-view color agreement asserted here."""

import numpy as np
import pytest

from mvdfusion_tpu.data.synthetic import (
    DEPTH_SCALE,
    DEPTH_SHIFT,
    SyntheticScenes,
    metric_to_stored,
)


def test_contract_and_ranges():
    ds = SyntheticScenes(n_scenes=2, image_size=32, seed=3)
    assert len(ds) == 2
    s = ds[0]
    assert s["images"].shape == (16, 32, 32, 3)
    assert s["depths"].shape == (16, 32, 32, 1)
    assert s["masks"].shape == (16, 32, 32, 1)
    assert s["R"].shape == (16, 3, 3) and s["T"].shape == (16, 3)
    assert 0.0 <= s["images"].min() and s["images"].max() <= 1.0
    assert 0.0 <= s["depths"].min() and s["depths"].max() <= 1.0
    # every view must actually see the object
    fg = s["masks"].reshape(16, -1).mean(axis=1)
    assert (fg > 0.01).all(), fg
    # foreground depth sits in the rig's metric band [~1.0, ~2.0]
    d_fg = s["depths"][s["masks"] > 0.5]
    z = d_fg * DEPTH_SCALE + DEPTH_SHIFT
    assert z.min() > 0.7 and z.max() < 2.3
    # determinism
    s2 = SyntheticScenes(n_scenes=2, image_size=32, seed=3)[0]
    np.testing.assert_array_equal(s["images"], s2["images"])
    # different scenes differ
    assert not np.allclose(s["images"], ds[1]["images"])


def test_textured_variant():
    """textured=True modulates albedo by a pure surface function: renders
    must differ from the untextured scene, stay in range, and remain
    deterministic; textured=False must be bit-identical to the original."""
    a = SyntheticScenes(n_scenes=1, image_size=32, seed=3)[0]
    t = SyntheticScenes(n_scenes=1, image_size=32, seed=3, textured=True)[0]
    assert not np.allclose(a["images"], t["images"])
    assert 0.0 <= t["images"].min() and t["images"].max() <= 1.0
    # geometry (depth/mask) is texture-independent
    np.testing.assert_array_equal(a["depths"], t["depths"])
    np.testing.assert_array_equal(a["masks"], t["masks"])
    t2 = SyntheticScenes(n_scenes=1, image_size=32, seed=3, textured=True)[0]
    np.testing.assert_array_equal(t["images"], t2["images"])


@pytest.mark.parametrize("textured", [False, True])
def test_cross_view_consistency(textured):
    """Unproject view A's rendered depth to world points, reproject into
    view B, grid_sample view B's rendering (negated-xy convention,
    nn/viewattn.py:244-245): where the point is unoccluded in B, the
    sampled color must match view A's color (Lambertian shading and the
    analytic texture are both view-independent)."""
    import jax.numpy as jnp

    from mvdfusion_tpu.geometry.cameras import camera_slice, make_cameras, transform_points_ndc
    from mvdfusion_tpu.geometry.gridsample import grid_sample
    from mvdfusion_tpu.geometry.rays import pixel_rays, rays_to_points

    H = 48
    ds = SyntheticScenes(n_scenes=1, image_size=H, seed=1, textured=textured)
    s = ds[0]
    cams = make_cameras(s["R"], s["T"], s["f"], s["c"])
    va, vb = 2, 4  # adjacent-ish views, large mutual visibility

    rays_a = pixel_rays(camera_slice(cams, np.asarray([va])), H, H)
    z_a = s["depths"][va, ..., 0] * DEPTH_SCALE + DEPTH_SHIFT  # metric
    pts = rays_to_points(rays_a, jnp.asarray(z_a)[None, ..., None])  # (1,H,H,1,3)
    pts_flat = pts.reshape(1, -1, 3)

    cam_b = camera_slice(cams, np.asarray([vb]))
    ndc = transform_points_ndc(cam_b, pts_flat)  # (1, N, 3): x, y, 1/view-z
    samp_rgb = np.asarray(
        grid_sample(jnp.asarray(s["images"][vb][None]), -ndc[..., :2])
    ).reshape(H, H, 3)
    samp_depth = np.asarray(
        grid_sample(jnp.asarray(s["depths"][vb][None]), -ndc[..., :2])
    ).reshape(H, H)
    zb = 1.0 / np.asarray(ndc[0, :, 2]).reshape(H, H)  # point's metric depth in B

    mask_a = s["masks"][va, ..., 0] > 0.5
    # visibility: the reprojected point's depth in B matches B's rendered
    # depth (else it is occluded or off-silhouette in B)
    vis = mask_a & (np.abs(metric_to_stored(zb) - samp_depth) < 0.015)
    # in-bounds NDC only (border clamp would smear)
    xy = np.asarray(ndc[0, :, :2]).reshape(H, H, 2)
    vis &= (np.abs(xy) < 0.95).all(axis=-1)
    assert vis.sum() > 50, f"too few mutually visible pixels: {vis.sum()}"

    err = np.abs(samp_rgb - s["images"][va])[vis]
    # bilinear interpolation at silhouette edges leaves a small tail; the
    # bulk must agree tightly
    assert np.median(err) < 0.02, np.median(err)
    assert err.mean() < 0.06, err.mean()
