"""Image resampling primitives matching the reference's torch semantics.

Three resamplers appear on the reference's live path, all reproduced here on
NHWC tensors in MXU/VPU-friendly forms:

  * `area` downsampling by an integer factor (F.interpolate(mode='area') at
    viewfusion_zero_depth_rgb.py:212,221 [x0.125] and unet.py:206 [pyramid
    0.5^i]) — exact average pooling, implemented as reshape+mean.
  * nearest 2x upsampling (UNet/VAE Upsample) — reshape+broadcast.
  * bicubic resize with align_corners=True (kornia CLIP preprocess,
    encoders/modules.py:421-424) — expressed as two dense matmuls with a
    precomputed cubic-convolution weight matrix (A=-0.75, torch kernel), so
    it runs on the MXU and is bit-faithful to torch within fp32 tolerance.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def area_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Exact area (average-pool) downsample of NHWC by an integer factor."""
    if factor == 1:
        return x
    B, H, W, C = x.shape
    assert H % factor == 0 and W % factor == 0, (H, W, factor)
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    # f32 accumulation regardless of input dtype (bf16 inputs read at half
    # the HBM traffic, exact f32 mean, output back in the input dtype)
    return x.mean(axis=(2, 4), dtype=jnp.float32).astype(x.dtype)


def nearest_upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample of NHWC (torch F.interpolate nearest)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel used by torch/kornia bicubic."""
    at = np.abs(t)
    at2 = at * at
    at3 = at2 * at
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0,
        np.where(at < 2.0, a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=16)
def _bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix for align_corners=True bicubic."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    M = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(i0 + tap, 0, in_size - 1)  # border-replicate taps
        w = _cubic_kernel(frac - tap)
        np.add.at(M, (np.arange(out_size), idx), w)
    return M.astype(np.float32)


def bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic align_corners=True resize of NHWC via two matmuls."""
    B, H, W, C = x.shape
    My = jnp.asarray(_bicubic_matrix(H, out_h))
    Mx = jnp.asarray(_bicubic_matrix(W, out_w))
    x = jnp.einsum("oh,bhwc->bowc", My, x.astype(jnp.float32), precision="highest")
    x = jnp.einsum("ow,bhwc->bhoc", Mx, x, precision="highest")
    return x
