"""Dataset layouts, camera rigs, and the resume-aware scene sampler."""

import json
import os

import numpy as np
import pytest

from mvdfusion_tpu.data.rigs import (
    AZIMUTHS_16,
    AZIMUTHS_B64,
    ELEVATIONS_16,
    ELEVATIONS_B64,
    FOCAL_NDC,
    OBJAVERSE_TRAIN_RING,
    fixed_rig,
)
from mvdfusion_tpu.data.sampler import StatefulShardedSampler


def test_rig_constants_match_reference():
    # dataset/gso_test.py:48-56: 16 azimuths at 22.5deg, elev 30deg
    np.testing.assert_allclose(AZIMUTHS_16[1], 0.39269909262657166, atol=1e-6)
    np.testing.assert_allclose(ELEVATIONS_16, 0.5235987901687622, atol=1e-6)
    assert FOCAL_NDC == 2.1875
    # objaverse.py:10-34 64-view grid
    assert len(AZIMUTHS_B64) == 64 and len(ELEVATIONS_B64) == 64
    np.testing.assert_allclose(AZIMUTHS_B64[0], 0.39269909262657166, atol=1e-6)
    np.testing.assert_allclose(ELEVATIONS_B64[0], -0.1745329201221466, atol=1e-6)
    np.testing.assert_allclose(AZIMUTHS_B64[32], 0.0, atol=1e-6)
    np.testing.assert_allclose(ELEVATIONS_B64[32], 0.3490658402442932, atol=1e-6)
    # the fixed-elevation training ring: azimuths 0..2pi at elev 30deg
    # (objaverse.py:97: indices 40..55)
    np.testing.assert_allclose(ELEVATIONS_B64[OBJAVERSE_TRAIN_RING], 0.5235987901687622, atol=1e-6)
    np.testing.assert_allclose(AZIMUTHS_B64[OBJAVERSE_TRAIN_RING], AZIMUTHS_16, atol=1e-6)


def test_rig_camera_distance():
    R, T, f, c = fixed_rig(AZIMUTHS_16, ELEVATIONS_16)
    C = -np.einsum("bj,bkj->bk", T, R)
    np.testing.assert_allclose(np.linalg.norm(C, axis=1), 1.5, atol=1e-5)
    # y-up rig at elevation 30deg: camera height = 1.5 sin(30deg) = 0.75
    np.testing.assert_allclose(C[:, 1], 0.75, atol=1e-5)


def test_sampler_determinism_and_resume():
    s1 = StatefulShardedSampler(100, batch_size=4, seed=7)
    e0 = list(s1.epoch(0))
    assert len(e0) == 25 and all(len(b) == 4 for b in e0)
    # deterministic per epoch
    assert list(StatefulShardedSampler(100, 4, seed=7).epoch(0)) == e0
    # different epoch -> different order
    assert list(s1.epoch(1)) != e0
    # resume at step 10 skips the first 10 batches of the epoch
    s2 = StatefulShardedSampler(100, 4, seed=7, start_step=10)
    assert list(s2.epoch(0)) == e0[10:]
    s2.reset_offset()
    assert len(list(s2.epoch(1))) == 25


def test_wild_dataset(tmp_path):
    from PIL import Image

    from mvdfusion_tpu.data.datasets import Wild

    rgba = (np.random.default_rng(0).uniform(size=(48, 48, 4)) * 255).astype(np.uint8)
    rgba[..., 3] = 0  # fully transparent -> composited to white
    Image.fromarray(rgba, "RGBA").save(tmp_path / "thing.png")
    ds = Wild(str(tmp_path), image_size=32)
    scene = ds[0]
    assert scene["images"].shape == (16, 32, 32, 3)
    np.testing.assert_allclose(scene["images"], 1.0, atol=1e-6)  # white bg
    assert scene["R"].shape == (16, 3, 3)


def test_objaverse_dataset(tmp_path):
    from PIL import Image

    from mvdfusion_tpu.data.datasets import Objaverse

    root = tmp_path
    (root / "subset_list").mkdir()
    (root / "subset_list" / "tiny_train.json").write_text(json.dumps(["obj0"]))
    views = root / "tiny" / "obj0" / "views"
    views.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(64):
        Image.fromarray((rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)).save(
            views / f"{i:03d}_rgb.jpg"
        )
        Image.fromarray((rng.uniform(size=(32, 32)) * 255).astype(np.uint8)).save(
            views / f"{i:03d}_depth.png"
        )
    ds = Objaverse(str(root), subset="tiny", stage="train", image_size=32, load_depth=True)
    scene = ds[0]
    assert scene["images"].shape == (16, 32, 32, 3)
    assert scene["depths"].shape == (16, 32, 32, 1)
    np.testing.assert_allclose(scene["elevation"], 0.5235987901687622, atol=1e-6)


def test_native_decoder_matches_python(tmp_path):
    """The C++ loader (native/loader.cc) must reproduce the Python path:
    PNG decode to [0,1], the reference's hard alpha<0.5 white composite
    (gso_test.py:96-114), and identity at same-size resize."""
    native = pytest.importorskip("mvdfusion_tpu.native")
    if not native.available():
        pytest.skip("native loader not built on this box")
    import imageio.v2 as imageio

    rng = np.random.default_rng(7)
    rgb = (rng.uniform(size=(24, 24, 3)) * 255).astype(np.uint8)
    alpha = (rng.uniform(size=(24, 24, 1)) * 255).astype(np.uint8)
    p_rgb = str(tmp_path / "a.png")
    p_rgba = str(tmp_path / "b.png")
    imageio.imwrite(p_rgb, rgb)
    imageio.imwrite(p_rgba, np.concatenate([rgb, alpha], axis=-1))

    out = native.decode_batch([p_rgb, p_rgba], 24, 24, 3, white_composite=True, n_threads=2)
    assert out.shape == (2, 24, 24, 3) and out.dtype == np.float32

    ref_rgb = rgb.astype(np.float32) / 255.0
    np.testing.assert_allclose(out[0], ref_rgb, atol=1e-5)
    # hard composite: alpha < 0.5 -> white (no blending), else foreground
    m = (alpha.astype(np.float32) / 255.0) < 0.5
    ref_comp = np.where(m, 1.0, ref_rgb)
    np.testing.assert_allclose(out[1], ref_comp, atol=1e-5)

    # area downscale stays in range and finite
    small = native.decode_batch([p_rgb], 12, 12, 3, white_composite=False, n_threads=1)
    assert small.shape == (1, 12, 12, 3)
    assert np.isfinite(small).all() and small.min() >= 0.0 and small.max() <= 1.0


def test_native_decoder_nonsquare_and_16bit(tmp_path):
    """Python fallback and native loader must agree on the corpus the
    reference actually loads (objaverse.py:136-170): non-square images,
    JPEG, and 16-bit depth PNGs (which the reference divides by 255 like
    everything else, so values land in [0, 257])."""
    native = pytest.importorskip("mvdfusion_tpu.native")
    if not native.available():
        pytest.skip("native loader not built on this box")
    import imageio.v2 as imageio

    from mvdfusion_tpu.data.datasets import _imread

    rng = np.random.default_rng(11)
    h, w = 20, 32  # non-square

    rgb = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    p_png = str(tmp_path / "ns.png")
    imageio.imwrite(p_png, rgb)

    p_jpg = str(tmp_path / "ns.jpg")
    imageio.imwrite(p_jpg, rgb, quality=95)

    d16 = (rng.uniform(size=(h, w)) * 65535).astype(np.uint16)
    p_d16 = str(tmp_path / "depth16.png")
    imageio.imwrite(p_d16, d16)

    # identity-size decode: native == python == raw/255 semantics
    out_png = native.decode_batch([p_png], h, w, 3, white_composite=False, n_threads=1)[0]
    np.testing.assert_allclose(out_png, _imread(p_png), atol=1e-5)

    # JPEG: both sides run libjpeg-family decoders; allow IDCT rounding
    out_jpg = native.decode_batch([p_jpg], h, w, 3, white_composite=False, n_threads=1)[0]
    np.testing.assert_allclose(out_jpg, _imread(p_jpg), atol=2.0 / 255.0)

    # 16-bit depth: full precision kept, /255 scaling -> values up to ~257
    out_d16 = native.decode_batch([p_d16], h, w, 1, white_composite=False, n_threads=1)[0]
    ref_d16 = _imread(p_d16)
    assert ref_d16.max() > 2.0  # proves the 16-bit range actually survives
    np.testing.assert_allclose(out_d16, ref_d16, rtol=1e-6, atol=1e-4)

    # non-square downscale: native box filter stays finite/in-range
    half = native.decode_batch([p_png], h // 2, w // 2, 3, white_composite=False, n_threads=1)
    assert half.shape == (1, h // 2, w // 2, 3)
    assert np.isfinite(half).all()
