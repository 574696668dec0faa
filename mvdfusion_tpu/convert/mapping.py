"""Torch-checkpoint -> Flax-param mapping tables.

Builds, from a ViewFusionConfig, the complete mapping
    flax param path (tuple of str) -> (torch key, transform)
for every tower, so real reference checkpoints (weights/mvdfusion_sep23.pt,
zero123_105000.ckpt, SD VAE, OpenAI CLIP) convert into this framework's
pytree. Torch naming follows the reference module trees:
  * UNet: mvdfusion/unet.py:215-507 over openaimodel blocks (incl. the
    post-insertion positions produced by the param_mapper surgery,
    unet.py:70-86)
  * VAE: external/sd1/ldm/modules/diffusionmodules/model.py:368-577
  * CLIP visual tower: OpenAI clip ViT (q/k/v fused as in_proj)
  * GridAttn + top-level: mvdfusion/view_attn_efficient2.py:96-165,
    viewfusion_zero_depth_rgb.py:107-132

Transforms map torch layouts to ours: Linear (out,in)->(in,out) transpose,
Conv OIHW->HWIO, 1x1 convs -> Dense kernels, CLIP fused qkv -> split heads.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from mvdfusion_tpu.nn.viewfusion import ViewFusionConfig

Path = Tuple[str, ...]
Entry = Tuple[str, str]  # (torch key, transform name)

TRANSFORMS: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "none": lambda w: w,
    "linear": lambda w: w.T,
    "conv": lambda w: np.transpose(w, (2, 3, 1, 0)),
    "conv1x1": lambda w: w[:, :, 0, 0].T,
    "qkv_q": lambda w: w[: w.shape[0] // 3].T,
    "qkv_k": lambda w: w[w.shape[0] // 3 : 2 * w.shape[0] // 3].T,
    "qkv_v": lambda w: w[2 * w.shape[0] // 3 :].T,
    "qkvb_q": lambda b: b[: b.shape[0] // 3],
    "qkvb_k": lambda b: b[b.shape[0] // 3 : 2 * b.shape[0] // 3],
    "qkvb_v": lambda b: b[2 * b.shape[0] // 3 :],
}


def _dense(table, fpath: Path, tkey: str, bias: bool = True):
    table[fpath + ("kernel",)] = (tkey + ".weight", "linear")
    if bias:
        table[fpath + ("bias",)] = (tkey + ".bias", "none")


def _conv(table, fpath: Path, tkey: str, bias: bool = True):
    table[fpath + ("kernel",)] = (tkey + ".weight", "conv")
    if bias:
        table[fpath + ("bias",)] = (tkey + ".bias", "none")


def _conv1x1(table, fpath: Path, tkey: str):
    table[fpath + ("kernel",)] = (tkey + ".weight", "conv1x1")
    table[fpath + ("bias",)] = (tkey + ".bias", "none")


def _norm(table, fpath: Path, tkey: str, kind: str = "GroupNorm_0"):
    table[fpath + (kind, "scale")] = (tkey + ".weight", "none")
    table[fpath + (kind, "bias")] = (tkey + ".bias", "none")


def _cross_attention(table, fpath: Path, tkey: str):
    """LDM CrossAttention (attention.py:152-193)."""
    _dense(table, fpath + ("to_q",), tkey + ".to_q", bias=False)
    _dense(table, fpath + ("to_k",), tkey + ".to_k", bias=False)
    _dense(table, fpath + ("to_v",), tkey + ".to_v", bias=False)
    _dense(table, fpath + ("to_out",), tkey + ".to_out.0")


def _transformer_block(table, fpath: Path, tkey: str):
    """BasicTransformerBlock / DualAttnetionBlock share this layout."""
    _cross_attention(table, fpath + ("attn1",), tkey + ".attn1")
    _cross_attention(table, fpath + ("attn2",), tkey + ".attn2")
    _dense(table, fpath + ("ff", "geglu", "proj"), tkey + ".ff.net.0.proj")
    _dense(table, fpath + ("ff", "out"), tkey + ".ff.net.2")
    for n in ("norm1", "norm2", "norm3"):
        _norm(table, fpath + (n,), f"{tkey}.{n}", kind="LayerNorm_0")


def _spatial_transformer(table, fpath: Path, tkey: str, depth: int):
    _norm(table, fpath + ("norm",), tkey + ".norm")
    _conv1x1(table, fpath + ("proj_in",), tkey + ".proj_in")
    for d in range(depth):
        _transformer_block(table, fpath + (f"block_{d}",), f"{tkey}.transformer_blocks.{d}")
    _conv1x1(table, fpath + ("proj_out",), tkey + ".proj_out")


def _view_aligned_transformer(table, fpath: Path, tkey: str, depth: int):
    """ViewAlignedFeatureTransformer, use_linear=True (attention.py:72-145)."""
    _norm(table, fpath + ("norm",), tkey + ".aligned_attn_norm")
    _dense(table, fpath + ("proj_in",), tkey + ".aligned_attn_proj_in")
    for d in range(depth):
        _transformer_block(table, fpath + (f"block_{d}",), f"{tkey}.aligned_attn_transformer_blocks.{d}")
    _dense(table, fpath + ("proj_out",), tkey + ".aligned_attn_proj_out")


def _res_block(table, fpath: Path, tkey: str, has_skip: bool):
    _norm(table, fpath + ("norm1",), tkey + ".in_layers.0")
    _conv(table, fpath + ("conv1",), tkey + ".in_layers.2")
    _dense(table, fpath + ("emb_proj",), tkey + ".emb_layers.1")
    _norm(table, fpath + ("norm2",), tkey + ".out_layers.0")
    _conv(table, fpath + ("conv2",), tkey + ".out_layers.3")
    if has_skip:
        _conv1x1(table, fpath + ("skip",), tkey + ".skip_connection")


def unet_mapping(cfg: ViewFusionConfig, prefix: str = "") -> Dict[Path, Entry]:
    """Mapping for the modified zero123 UNet, post key surgery."""
    t: Dict[Path, Entry] = {}
    mc = cfg.unet_model_channels
    mult = cfg.unet_channel_mult
    nrb = cfg.unet_num_res_blocks
    depth = cfg.unet_transformer_depth
    attn_res = set(cfg.unet_attention_resolutions)

    _dense(t, ("time_dense1",), prefix + "time_embed.0")
    _dense(t, ("time_dense2",), prefix + "time_embed.2")
    _conv(t, ("conv_in",), prefix + "input_blocks.0.0")

    # input blocks
    ch = mc
    ds = 1
    idx = 1
    for level, m in enumerate(mult):
        for i in range(nrb):
            in_ch = ch
            ch = m * mc
            _res_block(t, (f"down_{level}_res_{i}",), f"{prefix}input_blocks.{idx}.0", in_ch != ch)
            if ds in attn_res:
                _spatial_transformer(t, (f"down_{level}_attn_{i}",), f"{prefix}input_blocks.{idx}.1", depth)
            idx += 1
        if level != len(mult) - 1:
            _conv(t, (f"down_{level}_downsample", "conv"), f"{prefix}input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2

    # middle (positions post param_mapper: res, attn, VAFT, res at 0,1,2,3)
    _res_block(t, ("mid_res_0",), f"{prefix}middle_block.0", False)
    _spatial_transformer(t, ("mid_attn",), f"{prefix}middle_block.1", depth)
    _view_aligned_transformer(t, ("mid_view_attn",), f"{prefix}middle_block.2", depth)
    _res_block(t, ("mid_res_1",), f"{prefix}middle_block.3", False)

    # output blocks
    idx = 0
    for level, m in reversed(list(enumerate(mult))):
        for i in range(nrb + 1):
            ch = m * mc
            _res_block(t, (f"up_{level}_res_{i}",), f"{prefix}output_blocks.{idx}.0", True)
            sub = 1
            if ds in attn_res:
                _spatial_transformer(t, (f"up_{level}_attn_{i}",), f"{prefix}output_blocks.{idx}.{sub}", depth)
                sub += 1
                _view_aligned_transformer(
                    t, (f"up_{level}_view_attn_{i}",), f"{prefix}output_blocks.{idx}.{sub}", depth
                )
                sub += 1
            if level and i == nrb:
                _conv(t, (f"up_{level}_upsample", "conv"), f"{prefix}output_blocks.{idx}.{sub}.conv")
                ds //= 2
            idx += 1

    _norm(t, ("norm_out",), prefix + "out.0")
    _conv(t, ("conv_out",), prefix + "out.2")
    return t


def _vae_res(table, fpath: Path, tkey: str, has_shortcut: bool):
    _norm(table, fpath + ("norm1",), tkey + ".norm1")
    _conv(table, fpath + ("conv1",), tkey + ".conv1")
    _norm(table, fpath + ("norm2",), tkey + ".norm2")
    _conv(table, fpath + ("conv2",), tkey + ".conv2")
    if has_shortcut:
        _conv1x1(table, fpath + ("nin_shortcut",), tkey + ".nin_shortcut")


def _vae_attn(table, fpath: Path, tkey: str):
    _norm(table, fpath + ("norm",), tkey + ".norm")
    for n in ("q", "k", "v", "proj_out"):
        _conv1x1(table, fpath + (n,), f"{tkey}.{n}")


def vae_mapping(cfg: ViewFusionConfig, prefix: str = "") -> Dict[Path, Entry]:
    t: Dict[Path, Entry] = {}
    ch = cfg.vae_ch
    mult = cfg.vae_ch_mult
    nrb = cfg.vae_num_res_blocks

    # encoder
    _conv(t, ("encoder", "conv_in"), prefix + "encoder.conv_in")
    block_in = ch
    for level, m in enumerate(mult):
        for i in range(nrb):
            block_out = ch * m
            _vae_res(
                t, ("encoder", f"down_{level}_block_{i}"),
                f"{prefix}encoder.down.{level}.block.{i}", block_in != block_out,
            )
            block_in = block_out
        if level != len(mult) - 1:
            _conv(t, ("encoder", f"down_{level}_downsample", "conv"),
                  f"{prefix}encoder.down.{level}.downsample.conv")
    _vae_res(t, ("encoder", "mid_block_1"), prefix + "encoder.mid.block_1", False)
    _vae_attn(t, ("encoder", "mid_attn_1"), prefix + "encoder.mid.attn_1")
    _vae_res(t, ("encoder", "mid_block_2"), prefix + "encoder.mid.block_2", False)
    _norm(t, ("encoder", "norm_out"), prefix + "encoder.norm_out")
    _conv(t, ("encoder", "conv_out"), prefix + "encoder.conv_out")

    # decoder
    _conv(t, ("decoder", "conv_in"), prefix + "decoder.conv_in")
    _vae_res(t, ("decoder", "mid_block_1"), prefix + "decoder.mid.block_1", False)
    _vae_attn(t, ("decoder", "mid_attn_1"), prefix + "decoder.mid.attn_1")
    _vae_res(t, ("decoder", "mid_block_2"), prefix + "decoder.mid.block_2", False)
    block_in = ch * mult[-1]
    for level in reversed(range(len(mult))):
        block_out = ch * mult[level]
        for i in range(nrb + 1):
            _vae_res(
                t, ("decoder", f"up_{level}_block_{i}"),
                f"{prefix}decoder.up.{level}.block.{i}", block_in != block_out,
            )
            block_in = block_out
        if level != 0:
            _conv(t, ("decoder", f"up_{level}_upsample", "conv"),
                  f"{prefix}decoder.up.{level}.upsample.conv")
    _norm(t, ("decoder", "norm_out"), prefix + "decoder.norm_out")
    _conv(t, ("decoder", "conv_out"), prefix + "decoder.conv_out")

    _conv1x1(t, ("quant_conv",), prefix + "quant_conv")
    _conv1x1(t, ("post_quant_conv",), prefix + "post_quant_conv")
    return t


def clip_mapping(cfg: ViewFusionConfig, prefix: str = "visual.") -> Dict[Path, Entry]:
    """OpenAI CLIP visual tower (fused in_proj split into q/k/v)."""
    t: Dict[Path, Entry] = {}
    v: Path = ("visual",)
    t[v + ("patch_embed", "kernel")] = (prefix + "conv1.weight", "conv")
    t[v + ("class_embedding",)] = (prefix + "class_embedding", "none")
    t[v + ("positional_embedding",)] = (prefix + "positional_embedding", "none")
    t[v + ("proj",)] = (prefix + "proj", "none")
    _norm(t, v + ("ln_pre",), prefix + "ln_pre", kind="LayerNorm_0")
    _norm(t, v + ("ln_post",), prefix + "ln_post", kind="LayerNorm_0")
    for i in range(cfg.clip_layers):
        b: Path = v + (f"block_{i}",)
        tb = f"{prefix}transformer.resblocks.{i}"
        for which in ("q", "k", "v"):
            t[b + ("attn", f"{which}_proj", "kernel")] = (tb + ".attn.in_proj_weight", f"qkv_{which}")
            t[b + ("attn", f"{which}_proj", "bias")] = (tb + ".attn.in_proj_bias", f"qkvb_{which}")
        _dense(t, b + ("attn", "out_proj"), tb + ".attn.out_proj")
        _norm(t, b + ("ln_1",), tb + ".ln_1", kind="LayerNorm_0")
        _norm(t, b + ("ln_2",), tb + ".ln_2", kind="LayerNorm_0")
        _dense(t, b + ("mlp_fc",), tb + ".mlp.c_fc")
        _dense(t, b + ("mlp_proj",), tb + ".mlp.c_proj")
    return t


def viewattn_mapping(cfg: ViewFusionConfig, prefix: str = "") -> Dict[Path, Entry]:
    """GridAttn (view_attn_efficient2.py:96-165); the dead t_embedder /
    ray_embedder members are intentionally unmapped."""
    t: Dict[Path, Entry] = {}
    _dense(t, ("z_embedder",), prefix + "z_embedder.0")
    # the factorized projector holds the pre_layer_b Linear verbatim
    _dense(t, ("pre_layer",), prefix + "pre_layer_b.0")
    for i in range(cfg.viewattn_layers):
        b: Path = ("aggregator", f"block_{i}")
        tb = f"{prefix}aggregation_transformer.layer_list.{i}"
        _dense(t, b + ("attn", "qkv"), tb + ".attn.qkv")
        _dense(t, b + ("attn", "proj"), tb + ".attn.proj")
        _dense(t, b + ("mlp", "fc1"), tb + ".mlp.fc1")
        _dense(t, b + ("mlp", "fc2"), tb + ".mlp.fc2")
        _dense(t, b + ("adaLN",), tb + ".adaLN_modulation.1")
    _dense(t, ("aggregator", "weight_layer"), prefix + "aggregation_transformer.weight_layer")
    _dense(t, ("final_layer",), prefix + "final_layer_b")
    return t


def viewfusion_mapping(cfg: ViewFusionConfig) -> Dict[Path, Entry]:
    """Full-model mapping for a reference ViewFusion state dict
    (weights/mvdfusion_sep23.pt layout: demo.py:161-169)."""
    t: Dict[Path, Entry] = {}
    # the UNetWrapper wraps UNetModel as .unet_model, and ViewFusion's attr
    # is also unet_model -> torch prefix unet_model.unet_model.
    for k, v in unet_mapping(cfg, prefix="unet_model.unet_model.").items():
        t[("unet",) + k] = v
    for k, v in vae_mapping(cfg, prefix="vae.").items():
        t[("vae",) + k] = v
    for k, v in clip_mapping(cfg, prefix="clip_image_encoder.model.visual.").items():
        t[("clip",) + k] = v
    for k, v in viewattn_mapping(cfg, prefix="view_attn.").items():
        t[("view_attn",) + k] = v
    for i, tidx in enumerate((0, 2, 4)):
        _dense(t, (f"cc_layers_{i}",), f"cc_projection.{tidx}")
    _dense(t, ("time_dense1",), "time_embed.0")
    _dense(t, ("time_dense2",), "time_embed.2")
    return t
