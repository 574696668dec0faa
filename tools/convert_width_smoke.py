"""Width-true converter smoke (VERDICT r2 missing #1 / next #3).

tests/test_convert_full.py proves the mapping tables at small widths; this
tool runs the SAME strict conversion at the reference's REAL widths — 320-ch
UNet, 768-d context, ViT-L/14 CLIP (width 1024 / 24 layers / 16 heads),
128-ch VAE, 256-hid GridAttn — retiring the remaining table risks that only
appear at width (head-count bookkeeping, fused-qkv splits, eye-init masking).

Steps:
  1. synthesize a full-width reference-layout `mvdfusion_sep23`-style
     state_dict from tests/torch_ref.ViewFusion (every key a real checkpoint
     carries, randomized so identity inits can't mask a wrong row);
  2. run the strict viewfusion mapping (what load_viewfusion does after
     torch.load): REQUIRE 0 missing table rows on either side, 0 untouched
     flax params, unused torch keys limited to the documented dead set;
  3. spot-check width-sensitive rows (CLIP fused-qkv split, UNet head dims);
  4. execute ONE flagship CFG denoising step with the converted params and
     require a finite output.

Run:  python tools/convert_width_smoke.py            (TPU or CPU)
Log:  committed at docs/CONVERT_SMOKE.log
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    if not os.environ.get("MVDF_NO_COMPILE_CACHE"):
        try:
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception as e:  # pragma: no cover
            print(f"compile cache unavailable: {e}")

    import torch_ref
    from mvdfusion_tpu.convert.mapping import viewfusion_mapping
    from mvdfusion_tpu.convert.torch_to_flax import apply_mapping
    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig

    cfg = ViewFusionConfig()  # REAL widths — the flagship config
    model = ViewFusion(cfg)

    # ---- flax params at full width ---------------------------------------
    rng = np.random.default_rng(0)
    S, IMG = 9, 256
    images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
    azim = np.linspace(0.0, 320.0, S)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90.0)
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    ii = jnp.asarray([0])
    ti = jnp.asarray(np.arange(1, S), jnp.int32)
    t0 = time.time()
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), images, R, T, f, c, ii, ti, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(f"flax init: {n_params/1e6:.1f}M params in {time.time()-t0:.1f}s")

    # ---- full-width reference-layout checkpoint ---------------------------
    t0 = time.time()
    tmodel = torch_ref.randomize_(torch_ref.ViewFusion(
        mc=cfg.unet_model_channels, context_dim=cfg.context_dim,
        va_hidden=cfg.viewattn_hidden, va_layers=cfg.viewattn_layers,
        va_heads=cfg.viewattn_heads, vae_ch=cfg.vae_ch,
        clip_width=cfg.clip_width, clip_layers=cfg.clip_layers,
        clip_heads=cfg.clip_heads, time_embed_dim=cfg.time_embed_dim,
        image_size=cfg.latent_size, n_pts_per_ray=cfg.n_pts_per_ray,
    ))
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    tn = sum(int(np.prod(v.shape)) for v in state.values())
    print(f"torch ref state dict: {len(state)} keys, {tn/1e6:.1f}M values in {time.time()-t0:.1f}s")

    # ---- strict conversion -------------------------------------------------
    table = viewfusion_mapping(cfg)
    t0 = time.time()
    new_params, stats = apply_mapping(
        jax.device_get(params), state, table, verbose=False, strict=True, return_stats=True
    )
    dead_prefixes = (
        "scheduler.", "view_attn.t_embedder.",
        "clip_image_encoder.model.token_embedding",
        "clip_image_encoder.model.positional_embedding",
        "clip_image_encoder.model.ln_final",
        "clip_image_encoder.model.text_projection",
        "clip_image_encoder.model.logit_scale",
    )
    stray = [k for k in stats.unused_torch if not k.startswith(dead_prefixes)]
    print(
        f"strict conversion at REAL widths in {time.time()-t0:.1f}s:\n"
        f"  table rows: {len(table)}  wrote: {len(stats.wrote)}\n"
        f"  missing flax params: {len(stats.missing_flax)} (require 0)\n"
        f"  missing torch keys:  {len(stats.missing_torch)} (require 0)\n"
        f"  untouched flax:      {len(stats.untouched_flax)} (require 0)\n"
        f"  unused torch keys outside documented dead set: {len(stray)} (require 0)"
    )
    assert not stats.missing_flax, stats.missing_flax[:10]
    assert not stats.missing_torch, stats.missing_torch[:10]
    assert not stats.untouched_flax, stats.untouched_flax[:10]
    assert not stray, stray[:10]

    # ---- width-sensitive spot checks --------------------------------------
    flat = {
        "/".join(str(getattr(kk, "key", kk)) for kk in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(new_params)[0]
    }
    # CLIP fused in_proj qkv split at width 1024 (the torchscript archive
    # stores one (3W, W) in_proj_weight; table must split it by thirds)
    W = cfg.clip_width
    inw = state["clip_image_encoder.model.visual.transformer.resblocks.0.attn.in_proj_weight"]
    np.testing.assert_array_equal(flat["params/clip/visual/block_0/attn/q_proj/kernel"], inw[:W].T)
    np.testing.assert_array_equal(flat["params/clip/visual/block_0/attn/k_proj/kernel"], inw[W : 2 * W].T)
    np.testing.assert_array_equal(flat["params/clip/visual/block_0/attn/v_proj/kernel"], inw[2 * W :].T)
    # deep grafted UNet row at 320-ch widths (post-param_mapper position)
    np.testing.assert_array_equal(
        flat["params/unet/up_0_view_attn_2/block_0/attn2/to_k/kernel"],
        state["unet_model.unet_model.output_blocks.11.2.aligned_attn_transformer_blocks.0.attn2.to_k.weight"].T,
    )
    # eye-init masking check: converted values actually replaced the init
    np.testing.assert_array_equal(flat["params/cc_layers_0/kernel"], state["cc_projection.0.weight"].T)
    print("width-sensitive spot checks (clip qkv thirds, grafted UNet row, cc eye-init): OK")

    # ---- one flagship CFG denoising step with converted params -------------
    from mvdfusion_tpu.utils.common import cast_inference_params

    cparams = cast_inference_params(jax.device_put(new_params))
    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    _, cams, in_lat, in_cams, clip_v = prep(cparams, images, R, T, f, c, ii, ti)
    B, ls = int(clip_v.shape[0]), cfg.latent_size
    x = jax.random.normal(jax.random.PRNGKey(3), (B, ls, ls, 5))
    t = jnp.full((B,), 500, jnp.int32)
    step = jax.jit(
        lambda p, x: model.apply(
            p, x, cams, in_lat, in_cams, clip_v, t, jax.random.PRNGKey(0),
            jnp.asarray(2.5), method=ViewFusion.apply_model_cfg,
        )
    )
    t0 = time.time()
    out = np.asarray(step(cparams, x))
    print(
        f"flagship CFG step with converted params: out {out.shape} "
        f"|out|={np.abs(out).mean():.4f} finite={np.isfinite(out).all()} "
        f"({time.time()-t0:.1f}s incl. compile) on {jax.devices()[0].device_kind}"
    )
    assert np.isfinite(out).all()
    print("WIDTH-TRUE CONVERTER SMOKE: PASS")


if __name__ == "__main__":
    main()
