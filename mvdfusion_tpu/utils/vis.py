"""Artifact writers: jpg strips, gifs, depth maps.

Counterpart of the reference's eval artifact block (demo.py:100-147) and the
training visualizer (utils/vis_utils.py:21-93). numpy/PIL only.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(_to_u8(img)).save(path)


def save_strip(path: str, images: np.ndarray) -> None:
    """(B, H, W, 3) -> one horizontal strip jpg (demo.py:108-116)."""
    save_image(path, np.concatenate(list(images), axis=1))


def save_gif(path: str, frames: Sequence[np.ndarray], duration_s: float = 0.2) -> None:
    """Frame sequence -> gif (demo.py:118-122)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pil = [Image.fromarray(_to_u8(f)) for f in frames]
    pil[0].save(
        path, save_all=True, append_images=pil[1:], duration=int(duration_s * 1000), loop=0
    )


def depth_to_rgb(depth: np.ndarray) -> np.ndarray:
    """(..., H, W, 1) [0,1] depth -> 3-channel grayscale (demo.py:125-131)."""
    return np.repeat(np.clip(depth, 0.0, 1.0), 3, axis=-1)


def save_depth_artifacts(jpg_path: str, pred_depth, input_depth, gt_depth) -> None:
    """Depth strip png + raw npy + gif, mirroring demo.py:125-147."""
    vis_pred = depth_to_rgb(pred_depth)
    vis_in = depth_to_rgb(input_depth)
    strip = np.concatenate(
        [np.concatenate(list(vis_in), axis=1), np.concatenate(list(vis_pred), axis=1)], axis=1
    )
    save_image(jpg_path.replace(".jpg", "_depth.png"), strip)
    np.save(jpg_path.replace(".jpg", "_depth.npy"), strip)
    save_gif(jpg_path.replace(".jpg", "_depth.gif"), list(vis_pred))


def _nearest_upsample(x: np.ndarray, factor: int) -> np.ndarray:
    return np.repeat(np.repeat(x, factor, axis=-3), factor, axis=-2)


def save_train_vis_grid(
    path: str,
    noise_rgb: np.ndarray,  # (B, H, W, 3) decoded noisy latents
    pred_rgb: np.ndarray,  # (B, H, W, 3) decoded DDIM sample
    gt_rgb: np.ndarray,  # (B, H, W, 3)
    pred_depth: np.ndarray,  # (B, h, w, 1) in [0,1]
    gt_depth: np.ndarray,  # (B, h, w, 1)
    input_rgb: Optional[np.ndarray] = None,  # (1, H, W, 3)
    input_depth: Optional[np.ndarray] = None,  # (1, h, w, 1)
    concat_input: bool = False,
) -> None:
    """Training-time visual-diffusion grid (utils/vis_utils.py:21-93): five
    stacked rows [noise | pred | gt | pred_depth | gt_depth], views side by
    side, depths nearest-upsampled to image resolution."""
    H = pred_rgb.shape[1]
    factor = H // pred_depth.shape[1]
    row = lambda imgs: np.concatenate(list(np.clip(imgs, 0.0, 1.0)), axis=1)
    d3 = lambda d: depth_to_rgb(_nearest_upsample(d, factor))
    rows = [row(noise_rgb), row(pred_rgb), row(gt_rgb), row(d3(pred_depth)), row(d3(gt_depth))]
    if concat_input and input_rgb is not None:
        pre = [row(input_rgb)] * 3 + [row(d3(input_depth))] * 2
        rows = [np.concatenate([p, r], axis=1) for p, r in zip(pre, rows)]
    save_image(path, np.concatenate(rows, axis=0))


def save_loss_plot(path: str, losses, interval: int = 1) -> None:
    """Loss-curve plot (utils/vis_utils.py:96-105); falls back to a .npy dump
    when matplotlib is unavailable."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(losses, np.float32)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 4))
        plt.plot(np.arange(len(arr)) * interval, arr)
        plt.xlabel("step")
        plt.ylabel("loss")
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
    except ImportError:  # pragma: no cover
        np.save(path + ".npy", arr)


def save_eval_artifacts(
    save_dir: str,
    global_step: int,
    scene_idx: int,
    pred_rgb: np.ndarray,
    gt_rgb: np.ndarray,
    pred_depth: Optional[np.ndarray] = None,
    input_depth: Optional[np.ndarray] = None,
    gt_depth: Optional[np.ndarray] = None,
) -> str:
    """Write the full reference artifact set for one scene; returns jpg path."""
    n = len(pred_rgb)
    jpg = os.path.join(save_dir, f"{global_step:07d}_eval_{scene_idx:03d}_n{n}.jpg")
    save_strip(jpg, pred_rgb)
    save_gif(
        jpg.replace(".jpg", ".gif"),
        [np.concatenate([gt_rgb[j], pred_rgb[j]], axis=1) for j in range(n)],
    )
    if pred_depth is not None:
        save_depth_artifacts(jpg, pred_depth, input_depth, gt_depth)
    return jpg
