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


def test_mixed_family_contract_and_contact():
    """family='mixed' (boxes + cylinders + spheres with a guaranteed
    contact pair): dataset contract, flat-faced primitive presence, depth
    in the rig band, determinism, and a genuine occlusion-contact pair
    (bounding spheres of primitives 0 and 1 overlap)."""
    ds = SyntheticScenes(n_scenes=3, image_size=32, seed=3, family="mixed", textured=True)
    saw_flat = False
    for i in range(3):
        s = ds[i]
        assert s["images"].shape == (16, 32, 32, 3)
        assert np.isfinite(s["images"]).all() and np.isfinite(s["depths"]).all()
        assert 0.0 <= s["images"].min() and s["images"].max() <= 1.0
        fg = s["masks"].reshape(16, -1).mean(axis=1)
        assert (fg > 0.01).all(), fg
        z = s["depths"][s["masks"] > 0.5] * DEPTH_SCALE + DEPTH_SHIFT
        assert z.min() > 0.7 and z.max() < 2.3
        types, centers, sizes, *_ = ds.scene_params_mixed(i)
        saw_flat |= bool((types != 0).any())
        if len(types) >= 2:

            def bound(j):
                if types[j] == 0:
                    return sizes[j, 0]
                if types[j] == 1:
                    return float(np.linalg.norm(sizes[j]))
                return float(np.hypot(sizes[j, 0], sizes[j, 1]))

            gap = np.linalg.norm(centers[1] - centers[0])
            assert gap <= 0.86 * (bound(0) + bound(1)) + 0.11, (gap, types)
    assert saw_flat
    s2 = SyntheticScenes(n_scenes=3, image_size=32, seed=3, family="mixed", textured=True)[1]
    np.testing.assert_array_equal(ds[1]["images"], s2["images"])
    # spheres family unchanged by the family knob default
    a = SyntheticScenes(n_scenes=1, image_size=32, seed=3)[0]
    b = SyntheticScenes(n_scenes=1, image_size=32, seed=3, family="spheres")[0]
    np.testing.assert_array_equal(a["images"], b["images"])


def test_box_cylinder_intersections_exact():
    """Closed-form intersections against hand-computable rays."""
    o = np.zeros((1, 1, 1, 3), np.float32)
    o[..., 2] = -2.0  # origin behind, looking +z
    d = np.zeros((1, 1, 1, 3), np.float32)
    d[..., 2] = 1.0
    # box centered at origin, half-extents 0.5: entry at z=-0.5 -> t=1.5
    t, n, valid = SyntheticScenes._intersect_box(
        o, d, np.zeros(3, np.float32), np.full(3, 0.5, np.float32)
    )
    assert valid.all() and np.isclose(t[0, 0, 0], 1.5)
    np.testing.assert_allclose(n[0, 0, 0], [0, 0, -1], atol=1e-6)
    # cylinder r=0.25 hh=0.4 on y axis: side entry at z=-0.25 -> t=1.75
    t, n, valid = SyntheticScenes._intersect_cylinder(
        o, d, np.zeros(3, np.float32), 0.25, 0.4
    )
    assert valid.all() and np.isclose(t[0, 0, 0], 1.75)
    np.testing.assert_allclose(n[0, 0, 0], [0, 0, -1], atol=1e-6)
    # cap hit: ray from above straight down through the top cap
    o2 = np.zeros((1, 1, 1, 3), np.float32)
    o2[..., 1] = 2.0
    d2 = np.zeros((1, 1, 1, 3), np.float32)
    d2[..., 1] = -1.0
    t, n, valid = SyntheticScenes._intersect_cylinder(
        o2, d2, np.zeros(3, np.float32), 0.25, 0.4
    )
    assert valid.all() and np.isclose(t[0, 0, 0], 1.6)
    np.testing.assert_allclose(n[0, 0, 0], [0, 1, 0], atol=1e-6)
    # grazing miss next to the box
    o3 = o.copy()
    o3[..., 0] = 0.75
    t, n, valid = SyntheticScenes._intersect_box(
        o3, d, np.zeros(3, np.float32), np.full(3, 0.5, np.float32)
    )
    assert not valid.any()


@pytest.mark.parametrize(
    "textured,family", [(False, "spheres"), (True, "spheres"), (True, "mixed")]
)
def test_cross_view_consistency(textured, family):
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
    ds = SyntheticScenes(n_scenes=1, image_size=H, seed=1, textured=textured, family=family)
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
