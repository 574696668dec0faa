"""Dataset loaders for the three reference layouts (GSO eval, wild
single-image eval, Objaverse training renders).

Pure numpy/PIL host-side loaders — no framework tensors. Each scene is a
dict of float32 numpy arrays in NHWC:
    {index, idx, images (S,H,W,3), R (S,3,3), T (S,3), f (S,2), c (S,2),
     azimuth (S,), elevation (S,) [, depths (S,H,W,1), masks (S,H,W,1)]}
matching the reference's __getitem__ contract (dataset/objaverse.py:116-134,
README.md:87-96) with channels-last layout.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from mvdfusion_tpu.data.rigs import (
    AZIMUTHS_16,
    AZIMUTHS_B64,
    ELEVATIONS_16,
    ELEVATIONS_B64,
    OBJAVERSE_TRAIN_RING,
    fixed_rig,
)


def _native_batch(paths, size: int, white_composite: bool, channels: int = 3):
    """Decode via the C++ loader when built; None -> caller falls back."""
    try:
        from mvdfusion_tpu import native

        if native.available():
            return native.decode_batch(
                paths, size, size, channels, white_composite=white_composite, n_threads=4
            )
    except Exception:
        pass
    return None


def _imread(path: str) -> np.ndarray:
    """Read an image to float32 [0,1] (H, W, C)."""
    try:
        import imageio.v3 as iio

        img = np.asarray(iio.imread(path))
    except ImportError:  # pragma: no cover
        from PIL import Image

        img = np.asarray(Image.open(path))
    # The reference divides by 255 regardless of bit depth (objaverse.py:152,
    # gso_test.py:96): 16-bit depth PNGs deliberately come out in [0, 257].
    if img.dtype in (np.uint8, np.uint16):
        img = img.astype(np.float32) / 255.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    return img


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    """Antialiased resize to (size, size) like skimage.transform.resize
    (gso_test.py:101). Resizes in float32 per channel — no uint8 round-trip,
    so out-of-[0,1] values (16-bit depth /255) survive like the reference's
    skimage float path."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    from PIL import Image

    chans = [
        np.asarray(
            Image.fromarray(np.ascontiguousarray(img[..., k]), mode="F").resize(
                (size, size), Image.BILINEAR
            )
        )
        for k in range(img.shape[2])
    ]
    return np.stack(chans, axis=-1).astype(np.float32)


def _composite_white(rgba: np.ndarray) -> np.ndarray:
    """RGBA -> RGB on white where alpha < 0.5 (gso_test.py:104-110)."""
    if rgba.shape[-1] < 4:
        return rgba[..., :3]
    rgb = rgba[..., :3].copy()
    rgb[rgba[..., 3] < 0.5] = 1.0
    return rgb


class GSO:
    """Google-Scanned-Objects eval set (dataset/gso_test.py:19-159).

    Layout: {root}/{subset}.json lists scene dirs; each dir holds 32 RGBA
    pngs 000.png..; views 0..15 form the fixed 16-view rig at elev 30deg.
    """

    n_views = 16

    def __init__(self, root: str, subset: str = "test", image_size: int = 256, **_):
        self.root = root
        self.image_size = image_size
        subset_path = os.path.join(root, f"{subset}.json")
        with open(subset_path) as fp:
            self.scenes = json.load(fp)
        self.R, self.T, self.f, self.c = fixed_rig(AZIMUTHS_16, ELEVATIONS_16)

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, index: int) -> dict:
        scene_dir = os.path.join(self.root, self.scenes[index])
        paths = [os.path.join(scene_dir, f"{i:03d}.png") for i in range(self.n_views)]
        batch = _native_batch(paths, self.image_size, white_composite=True)
        if batch is not None:
            imgs = list(batch)
        else:
            imgs = [
                _composite_white(_resize(_imread(p), self.image_size)) for p in paths
            ]
        return {
            "index": index,
            "idx": self.scenes[index],
            "images": np.stack(imgs),
            "R": self.R,
            "T": self.T,
            "f": self.f,
            "c": self.c,
            "azimuth": AZIMUTHS_16.astype(np.float32),
            "elevation": ELEVATIONS_16.astype(np.float32),
        }


class Wild:
    """Single segmented RGBA image -> 16 identical frames on the fixed rig
    (dataset/wild_test.py:19-158): the input view conditions, the other 15
    are pure generation targets."""

    n_views = 16

    def __init__(self, root: str, subset: str = "test", image_size: int = 256, **_):
        self.root = root
        self.image_size = image_size
        subset_path = os.path.join(root, f"{subset}.json")
        if os.path.exists(subset_path):
            with open(subset_path) as fp:
                self.scenes = json.load(fp)
        else:
            self.scenes = sorted(os.listdir(root))
        self.R, self.T, self.f, self.c = fixed_rig(AZIMUTHS_16, ELEVATIONS_16)

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, index: int) -> dict:
        path = os.path.join(self.root, self.scenes[index])
        rgba = _resize(_imread(path), self.image_size)
        img = _composite_white(rgba)
        return {
            "index": index,
            "idx": self.scenes[index],
            "images": np.repeat(img[None], self.n_views, axis=0),
            "R": self.R,
            "T": self.T,
            "f": self.f,
            "c": self.c,
            "azimuth": AZIMUTHS_16.astype(np.float32),
            "elevation": ELEVATIONS_16.astype(np.float32),
        }


class Objaverse:
    """Objaverse training renders (dataset/objaverse.py:42-226).

    Layout: {root}/subset_list/{subset}_{stage}.json; scenes under
    {root}/{subset}/{uid}/views/ with 64 renders {i:03d}_rgb.jpg
    (+_depth.png, _mask.jpg). fix_elevation picks the 16-view 30deg ring.

    `sample_batch_size` (swallowed by **_) is dead on the reference's live
    path: objaverse.py:94-105 only reads it when fix_elevation is false, and
    every shipped config sets fix_elevation true (mvd_train.yaml:82-83).
    """

    def __init__(
        self,
        root: str,
        subset: str = "400k",
        stage: str = "train",
        image_size: int = 256,
        fix_elevation: bool = True,
        load_depth: bool = False,
        load_mask: bool = False,
        **_,
    ):
        self.root = root
        self.subset = subset
        self.stage = stage
        self.image_size = image_size
        self.fix_elevation = fix_elevation
        self.load_depth = load_depth
        self.load_mask = load_mask
        with open(os.path.join(root, "subset_list", f"{subset}_{stage}.json")) as fp:
            self.scenes = json.load(fp)
        R, T, f, c = fixed_rig(AZIMUTHS_B64, ELEVATIONS_B64)
        self.R, self.T, self.f, self.c = R, T, f, c

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, index: int) -> dict:
        scene_dir = os.path.join(self.root, self.subset, self.scenes[index], "views")
        idxs = OBJAVERSE_TRAIN_RING if self.fix_elevation else np.arange(64)
        rgb_paths = [os.path.join(scene_dir, f"{i:03d}_rgb.jpg") for i in idxs]
        batch = _native_batch(rgb_paths, self.image_size, white_composite=False)
        if batch is not None:
            imgs = list(batch)
        else:
            imgs = [_resize(_imread(p)[..., :3], self.image_size) for p in rgb_paths]
        depths, masks = [], []
        if self.load_depth or self.load_mask:
            d_paths = [os.path.join(scene_dir, f"{i:03d}_depth.png") for i in idxs]
            dbatch = _native_batch(d_paths, self.image_size, white_composite=False, channels=1)
            if dbatch is not None:
                depths = list(dbatch)
            else:
                depths = [
                    _resize(_imread(p), self.image_size)[..., :1] for p in d_paths
                ]
        if self.load_mask:
            masks = [
                _resize(_imread(os.path.join(scene_dir, f"{i:03d}_mask.jpg")), self.image_size)[
                    ..., :1
                ]
                for i in idxs
            ]
        out = {
            "index": index,
            "idx": self.scenes[index],
            "images": np.stack(imgs),
            "R": self.R[idxs],
            "T": self.T[idxs],
            "f": self.f[idxs],
            "c": self.c[idxs],
            "azimuth": AZIMUTHS_B64[idxs].astype(np.float32),
            "elevation": ELEVATIONS_B64[idxs].astype(np.float32),
        }
        if self.load_depth:
            out["depths"] = np.stack(depths)
        if self.load_mask:
            out["masks"] = np.stack(masks)
        return out
