"""Depth-guided cross-view attention (GridAttn) — the MVD-Fusion novelty.

Independent Flax re-design of mvdfusion/view_attn_efficient2.py:96-442.
Per denoising step:

  1. Unbias the noisy latent's depth channel by 1/sqrt(abar_t) and jitter it
     with sigma = sqrt(1-abar)/sqrt(abar)/10 (reference :417-431).
  2. Map to metric depth, shoot one ray per latent pixel at those depths,
     unproject to world points (:279-293).
  3. Reproject every point into all V views and the input view; bilinearly
     gather embedded latent features (:302-331).
  4. Concatenate [view feats | input feats | reference plucker | reference
     depth | query plucker | query depth | predict mask] into per-point
     V-axis token sequences (:333-370).
  5. Run a 3-layer adaLN-Zero DiT across the V axis, softmax-pool, and
     project to a (B, H, W, D, 768) feature frustum (:389-408).

TPU-first notes: everything is NHWC + static shapes; the gather is the
vectorised grid_sample from geometry/ (a fused Pallas path lives in ops/);
tokens are built directly in (tokens, V, C) layout so the V-axis attention
is one big batched MXU matmul.

Dead reference code intentionally not reproduced (SURVEY.md §2.1): the cube/
voxel-grid remnants, RayEmbedder/TimestepEmbedder members unused by forward,
index_features, ModulatedLinearBlock.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvdfusion_tpu.core.schedule import DDPMSchedule
from mvdfusion_tpu.geometry.cameras import Cameras, camera_center, transform_points_ndc
from mvdfusion_tpu.geometry.gridsample import grid_sample, grid_sample_mxu
from mvdfusion_tpu.geometry.harmonics import harmonic_embed, harmonic_output_dim
from mvdfusion_tpu.geometry.rays import pixel_rays, plucker_coords, rays_to_points
from mvdfusion_tpu.nn.layers import Dtype, LayerNormFp32, Mlp, TimmAttention
from mvdfusion_tpu.ops.crossview import (
    AggregatorWeights,
    GeoWeights,
    crossview_aggregate,
    should_fuse_crossview,
)


def _modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1 + scale[:, None]) + shift[:, None]


class DiTBlock(nn.Module):
    """adaLN-Zero DiT block (view_attn_efficient2.py:42-67); modulation MLP
    zero-initialised so the block starts as identity (:171-176)."""

    heads: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """x: (N, V, C) tokens; c: (1 or N, C) conditioning."""
        C = x.shape[-1]
        mod = nn.Dense(
            6 * C,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN",
        )(nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
        h = _modulate(LayerNormFp32(use_scale_bias=False, epsilon=1e-6, name="norm1")(x), sh_a, sc_a)
        x = x + g_a[:, None] * TimmAttention(self.heads, dtype=self.dtype, name="attn")(h)
        h = _modulate(LayerNormFp32(use_scale_bias=False, epsilon=1e-6, name="norm2")(x), sh_m, sc_m)
        x = x + g_m[:, None] * Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")(h)
        return x


class AggregationTransformer(nn.Module):
    """Stack of DiT blocks + scalar weighting head (:70-93)."""

    heads: int
    num_layers: int = 3
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray):
        for i in range(self.num_layers):
            x = DiTBlock(self.heads, self.mlp_ratio, dtype=self.dtype, name=f"block_{i}")(x, c)
        w = nn.Dense(1, dtype=self.dtype, name="weight_layer")(x)
        return x, w


class FactorizedTokenProjector(nn.Module):
    """Linear(concat(parts)) computed as a sum of per-part matmuls.

    Holds ONE (sum(dims), hidden) kernel — bit-identical parameters to the
    reference's pre_layer_b Linear (view_attn_efficient2.py:158) — sliced by
    part at apply time. Parts are keyed by their position in the reference's
    concat order. Because each slice is a plain linear map, it commutes with
    bilinear sampling: the feature-map parts are projected BEFORE the
    per-point gather (V*HW rows instead of V*N = V^2*HW*D), cutting the
    projection FLOPs by V*D with identical math.
    """

    hidden: int
    dims: tuple
    dtype: Dtype = jnp.float32

    def setup(self):
        total = sum(self.dims)
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (total, self.hidden), jnp.float32
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.hidden,), jnp.float32)
        offs = [0]
        for d in self.dims:
            offs.append(offs[-1] + d)
        self.offsets = tuple(offs)

    def part_kernel(self, i: int) -> jnp.ndarray:
        return self.kernel[self.offsets[i] : self.offsets[i + 1]].astype(self.dtype)

    def part(self, i: int, x: jnp.ndarray) -> jnp.ndarray:
        """Project one concat-slot through its kernel slice."""
        return jnp.dot(x, self.part_kernel(i), preferred_element_type=jnp.float32).astype(
            self.dtype
        )

    def __call__(self, v_parts: dict, b_parts: dict):
        acc_v = sum(self.part(i, p) for i, p in v_parts.items())
        acc_b = sum(self.part(i, p) for i, p in b_parts.items())
        return acc_v, acc_b + self.bias.astype(self.dtype)


class GridAttn(nn.Module):
    """Cross-view feature-frustum builder (view_attn_efficient2.py:96-442)."""

    input_size: int = 32
    in_channels: int = 5
    hidden_size: int = 256
    output_dim: int = 768
    num_heads: int = 8
    mlp_ratio: float = 2.0
    num_layers: int = 3
    depth_scale: float = 2.0
    depth_shift: float = 0.5
    n_pts_per_ray: int = 1
    n_harmonic: int = 7
    omega0: float = 0.1
    keep_top_k_views: bool = False
    top_k: int = 4
    dtype: Dtype = jnp.float32
    sampling: str = "mxu"  # "mxu" (one-hot matmul, TPU-fast) | "gather"
    # fused Pallas gather+DiT kernel (ops/crossview.py):
    #   "auto" (on TPU when shapes qualify) | "never" | "interpret" (force,
    #   interpreter mode — for CPU parity tests)
    crossview_kernel: str = "auto"

    @nn.compact
    def __call__(
        self,
        noisy_latents: jnp.ndarray,  # (B, H, W, 5) NHWC
        batch_cameras: Cameras,  # V == B target-view cameras
        predict_mask: jnp.ndarray,  # (B,)
        t_embed: jnp.ndarray,  # (B, hidden) — only [0:1] is used (shared t)
        t: jnp.ndarray,  # (B,) int timesteps
        sched: DDPMSchedule,
        input_latents: jnp.ndarray,  # (1, H, W, 5)
        input_cameras: Cameras,  # single input camera
        rng: jax.Array,  # depth-jitter noise key
        overwrite_attn_depth: Optional[jnp.ndarray] = None,  # (B, H, W, 1)
        jitter_noise: Optional[jnp.ndarray] = None,  # (B, H, W, D) unit normal
    ) -> jnp.ndarray:
        B, H, W, C_in = noisy_latents.shape
        D = self.n_pts_per_ray
        V = B

        # ---- 1. unbiased depth estimate + jitter (:417-431) ---------------
        sqrt_acp = sched.sqrt_alphas_cumprod[t]  # (B,)
        depth_std = (sched.sqrt_one_minus_alphas_cumprod[t] / sqrt_acp / 10.0)[:, None, None, None]
        if overwrite_attn_depth is None:
            depth = noisy_latents[..., 4:5] / sqrt_acp[:, None, None, None]
        else:
            depth = overwrite_attn_depth
        depth = jnp.broadcast_to(depth, (B, H, W, D))
        if jitter_noise is None:
            jitter_noise = jax.random.normal(rng, (B, H, W, D), depth.dtype)
        depth = depth + depth_std * jitter_noise
        # unnormalize clips to [0,1] (common_utils.py:66-70), then metric map
        depth = jnp.clip((depth + 1.0) * 0.5, 0.0, 1.0) * self.depth_scale + self.depth_shift

        # ---- 2. rays and world points (:279-293) --------------------------
        rays = pixel_rays(batch_cameras, H, W)
        pts = rays_to_points(rays, depth)  # (B, H, W, D, 3)
        pts_flat = pts.reshape(1, B * H * W * D, 3)
        N = B * H * W * D

        # ---- 3. embed latents (:434-437) -----------------------------------
        z_dense = nn.Dense(self.hidden_size, dtype=self.dtype, name="z_embedder")
        z_embed = lambda a: nn.gelu(z_dense(a), approximate=False)
        view_feat = z_embed(noisy_latents.astype(self.dtype))  # (V, H, W, hid)
        input_feat = z_embed(input_latents.astype(self.dtype))  # (1, H, W, hid)

        sample = grid_sample_mxu if self.sampling == "mxu" else grid_sample
        ndc_all = transform_points_ndc(batch_cameras, pts_flat)  # (V, N, 3)
        ndc_in = transform_points_ndc(input_cameras, pts_flat)  # (1, N, 3)

        # ---- 4. geometric embeddings (:333-361) ----------------------------
        # (the per-REFERENCE-view plücker/depth harmonics are computed inside
        # the fused kernel on the TPU path — see the use_kernel branch below;
        # the XLA fallback computes them explicitly)
        hembed = lambda a: harmonic_embed(a, self.n_harmonic, self.omega0)
        centers = camera_center(batch_cameras)  # (V, 3)

        q_dir = rays.directions / jnp.maximum(
            jnp.linalg.norm(rays.directions, axis=-1, keepdims=True), 1e-12
        )  # (B, H, W, 3)
        q_dir = jnp.broadcast_to(q_dir[:, :, :, None, :], (B, H, W, D, 3)).reshape(1, N, 3)
        q_origin = jnp.broadcast_to(centers[:, None, None, None, :], (B, H, W, D, 3)).reshape(1, N, 3)
        q_plucker = hembed(plucker_coords(q_origin, q_dir))  # (1, N, 90)
        q_depth_e = hembed(depth.reshape(1, N, 1))  # (1, N, 15)

        # ---- 5+6a. factorized token projection (:363-370 + pre_layer_b) ----
        # The reference concatenates 7 feature groups into a (V, N, 723)
        # token tensor and then applies Linear(723 -> hidden). Linear of a
        # concat == sum of linears of the parts, so we never materialise the
        # concat; and because the feature-map parts' slices commute with the
        # bilinear gather, the maps are projected BEFORE sampling (V*HW rows
        # instead of V*N = V^2*HW*D — a V*D x FLOP cut). At the 512^2 stretch
        # resolution this also removes a multi-GB concat intermediate.
        dt = self.dtype
        proj = FactorizedTokenProjector(
            hidden=self.hidden_size,
            dims=(self.hidden_size, self.hidden_size, 90, 15, 90, 15, 1),
            dtype=dt,
            name="pre_layer",
        )
        view_feat_p = proj.part(0, view_feat)  # (V, H, W, hid) pre-projected
        input_feat_p = proj.part(1, input_feat)  # (1, H, W, hid)
        # negated-xy grid convention (:310-316)
        in_feats_p = sample(input_feat_p, -ndc_in[..., :2])  # (1, N, hid)
        mask_tok = jnp.broadcast_to(predict_mask[:, None, None].astype(dt), (V, N, 1))
        acc_b = (
            in_feats_p
            + proj.part(4, q_plucker.astype(dt))
            + proj.part(5, q_depth_e.astype(dt))
            + proj.bias.astype(dt)
        )  # (1, N, hid)
        c = t_embed[:1].astype(dt)  # shared-t conditioning (:438)
        aggregator = AggregationTransformer(
            self.num_heads, self.num_layers, self.mlp_ratio, dtype=dt, name="aggregator"
        )
        final_layer = nn.Dense(self.output_dim, dtype=dt, name="final_layer")

        mode = self.crossview_kernel
        use_kernel = (
            not self.is_initializing()
            and not self.keep_top_k_views
            and (
                mode == "interpret"
                or (mode == "auto" and should_fuse_crossview(V, H, W, self.hidden_size, False))
            )
        )
        if use_kernel:
            # ---- fused Pallas path: geo build + gather + projection + DiT +
            # pool in one kernel; neither the token tensor nor the harmonic
            # embeddings ever touch HBM (ops/crossview.py) ------------------
            # reorganise the factorized projector's plucker(90)/depth(15)
            # kernels into the kernel's [raw | sin freq-major | cos] rows
            # (harmonic layout: per-dim blocks of n_harmonic, sin then cos,
            # raw input appended — geometry/harmonics.py)
            nh = self.n_harmonic
            P90 = proj.part_kernel(2)  # (90, hid) plucker6 embed
            P15 = proj.part_kernel(3)  # (15, hid) depth embed
            hs = self.hidden_size
            kx = jnp.concatenate([P90[12 * nh :], P15[2 * nh :]], axis=0)  # (7, hid)
            sin_all = jnp.concatenate(
                [jnp.swapaxes(P90[: 6 * nh].reshape(6, nh, hs), 0, 1), P15[:nh].reshape(nh, 1, hs)],
                axis=1,
            ).reshape(7 * nh, hs)
            cos_all = jnp.concatenate(
                [
                    jnp.swapaxes(P90[6 * nh : 12 * nh].reshape(6, nh, hs), 0, 1),
                    P15[nh : 2 * nh].reshape(nh, 1, hs),
                ],
                axis=1,
            ).reshape(7 * nh, hs)
            kgeo = GeoWeights(
                kall=jnp.concatenate([kx, sin_all, cos_all], axis=0),
                kmask=proj.part_kernel(6),
            )
            # static python floats (harmonic_frequencies returns a traced
            # jnp array under jit); logspace layout per geometry/harmonics.py
            freqs = tuple(float(self.omega0 * 2.0**k) for k in range(nh))
            av = aggregator.variables["params"]
            L = self.num_layers
            stack = lambda f: jnp.stack([f(av[f"block_{i}"]) for i in range(L)])
            cs = nn.silu(c.astype(jnp.float32))
            mods = jnp.stack(
                [
                    (
                        cs @ av[f"block_{i}"]["adaLN"]["kernel"].astype(jnp.float32)
                        + av[f"block_{i}"]["adaLN"]["bias"].astype(jnp.float32)
                    ).reshape(6, self.hidden_size)
                    for i in range(L)
                ]
            )
            fv = final_layer.variables["params"]
            weights = AggregatorWeights(
                qkv_k=stack(lambda b: b["attn"]["qkv"]["kernel"]),
                qkv_b=stack(lambda b: b["attn"]["qkv"]["bias"]),
                proj_k=stack(lambda b: b["attn"]["proj"]["kernel"]),
                proj_b=stack(lambda b: b["attn"]["proj"]["bias"]),
                fc1_k=stack(lambda b: b["mlp"]["fc1"]["kernel"]),
                fc1_b=stack(lambda b: b["mlp"]["fc1"]["bias"]),
                fc2_k=stack(lambda b: b["mlp"]["fc2"]["kernel"]),
                fc2_b=stack(lambda b: b["mlp"]["fc2"]["bias"]),
                mods=mods,
                wl_k=av["weight_layer"]["kernel"],
                wl_b=av["weight_layer"]["bias"],
                fin_k=fv["kernel"],
                fin_b=fv["bias"],
            )
            # positional call: custom_vjp + nondiff_argnums
            frustum = crossview_aggregate(
                -ndc_all[..., :2],
                pts_flat[0],
                centers,
                predict_mask,
                acc_b[0],
                view_feat_p,
                kgeo,
                weights,
                self.num_heads,
                64,
                mode == "interpret",
                freqs,
            )
            return frustum.reshape(B, H, W, D, self.output_dim)

        ref_dir = pts_flat[0][None] - centers[:, None]  # (V, N, 3)
        ref_depth = jnp.linalg.norm(ref_dir, axis=-1, keepdims=True)
        ref_depth_e = hembed(ref_depth)  # (V, N, 15)
        ref_dir = ref_dir / jnp.maximum(jnp.linalg.norm(ref_dir, axis=-1, keepdims=True), 1e-12)
        ref_plucker = hembed(plucker_coords(centers[:, None], ref_dir))  # (V, N, 90)
        acc_v = (
            sample(view_feat_p, -ndc_all[..., :2])
            + proj.part(2, ref_plucker.astype(dt))
            + proj.part(3, ref_depth_e.astype(dt))
            + proj.part(6, mask_tok)
        )  # (V, N, hid)

        if self.keep_top_k_views:
            # static window of top_k+1 nearest views by index, wrapping
            # (:375-384); only the V-varying projection needs the gather
            offsets = jnp.arange(-(self.top_k // 2), self.top_k // 2 + 1)
            view_of_token = jnp.arange(N) // (H * W * D)  # tokens are b-major
            idx = (view_of_token[None, :] + offsets[:, None]) % V  # (K+1, N)
            acc_v = jnp.take_along_axis(acc_v, idx[:, :, None], axis=0)

        tokens = jnp.swapaxes(acc_v + acc_b, 0, 1)  # (N, V', hid)
        tokens = nn.gelu(tokens, approximate=False)
        out, w = aggregator(tokens, c)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-2).astype(dt)
        pooled = (out * w).sum(axis=-2)  # (N, hid)
        frustum = final_layer(pooled)
        return frustum.reshape(B, H, W, D, self.output_dim)
