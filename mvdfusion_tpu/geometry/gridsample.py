"""Bilinear grid sampling (torch `grid_sample` semantics) as XLA gathers.

The reference relies on CUDA grid_sample with align_corners=True, bilinear,
border padding, always invoked on NEGATED NDC xy (view_attn_efficient2.py:
232-238, 310-331; utils/common_utils.py:115-119). We reproduce those exact
semantics on NHWC tensors with a vectorised 4-corner gather; the negation is
applied by the caller (geometry convention), not here.

TPU notes: `grid_sample` lowers to dynamic-gather on flattened HW;
`grid_sample_mxu` re-expresses the interpolation as a dense one-hot matmul
that rides the MXU — the form GridAttn uses on its hot path (nn/viewattn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_one(feat: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C), xy (N, 2) in torch grid convention -> (N, C)."""
    H, W, _ = feat.shape
    x = xy[:, 0]
    y = xy[:, 1]
    # align_corners=True mapping: -1 -> 0, +1 -> size-1 (pixel centers)
    ix = (x + 1.0) * 0.5 * (W - 1)
    iy = (y + 1.0) * 0.5 * (H - 1)
    # border padding: clamp the coordinate itself before interpolation
    ix = jnp.clip(ix, 0.0, W - 1)
    iy = jnp.clip(iy, 0.0, H - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, W - 1)
    iy1 = jnp.minimum(iy0 + 1, H - 1)

    flat = feat.reshape(H * W, -1)
    g = lambda yy, xx: jnp.take(flat, yy * W + xx, axis=0)
    w00 = ((1 - tx) * (1 - ty))[:, None]
    w01 = (tx * (1 - ty))[:, None]
    w10 = ((1 - tx) * ty)[:, None]
    w11 = (tx * ty)[:, None]
    out = w00 * g(iy0, ix0) + w01 * g(iy0, ix1) + w10 * g(iy1, ix0) + w11 * g(iy1, ix1)
    return out.astype(feat.dtype)


def grid_sample(features: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear sampling.

    features: (B, H, W, C) NHWC feature maps.
    xy:       (B, N, 2) torch-grid coords in [-1, 1] (x indexes width,
              y indexes height; align_corners=True, border padding).
    Returns (B, N, C).
    """
    return jax.vmap(_sample_one)(features, xy)


def _bilinear_weights(xy: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Dense (N, H*W) interpolation matrix with 4 non-zeros per row."""
    x = jnp.clip((xy[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((xy[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    ix0 = jnp.floor(x)
    iy0 = jnp.floor(y)
    tx = (x - ix0)[:, None]
    ty = (y - iy0)[:, None]
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, W - 1)
    iy1 = jnp.minimum(iy0 + 1, H - 1)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1)

    def corner(iy, ix, w):
        return jnp.where(p == (iy * W + ix)[:, None], w, 0.0)

    Wm = (
        corner(iy0, ix0, (1 - tx) * (1 - ty))
        + corner(iy0, ix1, tx * (1 - ty))
        + corner(iy1, ix0, (1 - tx) * ty)
        + corner(iy1, ix1, tx * ty)
    )
    return Wm


def grid_sample_mxu(features: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """grid_sample as a dense one-hot matmul — the TPU-fast path.

    Same semantics/signature as `grid_sample`, but expressed as
    (N, H*W) @ (H*W, C): bilinear weights become a 4-sparse row matrix built
    with iota comparisons (VPU) and the contraction rides the MXU. On TPU
    this beats the gather lowering whenever H*W is small (the 32x32 latent
    grids of this model); FLOP cost is 2*N*H*W*C per map, ~4 GFLOP at
    inference shapes — noise next to the UNet.
    """
    B, H, W, C = features.shape

    def one(feat, coords):
        Wm = _bilinear_weights(coords, H, W).astype(feat.dtype)
        return jnp.dot(Wm, feat.reshape(H * W, C), preferred_element_type=jnp.float32).astype(
            feat.dtype
        )

    return jax.vmap(one)(features, xy)
