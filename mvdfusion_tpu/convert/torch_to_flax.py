"""Convert reference torch checkpoints into this framework's Flax pytrees.

Covers the four weight artifacts the reference consumes (README.md:43-45,
SURVEY.md §2.7):
  * weights/mvdfusion_sep23.pt      — full ViewFusion state (demo.py:161-169)
  * weights/zero123_105000.ckpt     — UNet(+VAE) train init
                                      (configs/mvd_train.yaml:5,7) with the
                                      model.diffusion_model./first_stage_model.
                                      prefix strips, the param_mapper shift,
                                      and the shape-changed conv drops
  * weights/clip_vit_14.ckpt        — OpenAI CLIP torchscript archive
  * weights/zero123_105000_cc.ckpt  — cc_projection source
                                      (viewfusion_zero_depth_rgb.py:117-121)

torch is used read-only on CPU; all math downstream is numpy/JAX.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from mvdfusion_tpu.convert.mapping import (
    TRANSFORMS,
    clip_mapping,
    unet_mapping,
    vae_mapping,
    viewfusion_mapping,
)
from mvdfusion_tpu.convert.surgery import (
    ZERO123_PARAM_MAPPER,
    ZERO123_REMOVE_KEYS,
    apply_surgery,
    report_load,
)
from mvdfusion_tpu.nn.viewfusion import ViewFusionConfig


def _to_numpy_state(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Read a checkpoint's state dict; unwrap {state_dict|model_state_dict}
    and the torchscript archive form (CLIP).

    torch is optional (SURVEY.md §7.2): without a torch install the native
    zipfile/pickle reader (convert/torch_reader.py) parses both torch.save
    formats — incl. fp16/bf16 storages, stride/offset views and shared
    storages — AND TorchScript archives (the CLIP artifact), whose scripted
    module tree it flattens to the same dotted state-dict keys
    torch.jit.load().state_dict() reports. Conversion is fully torch-free."""
    try:
        import torch
    except ImportError:
        from mvdfusion_tpu.convert.torch_reader import read_torch_checkpoint

        obj = read_torch_checkpoint(path)
    else:
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            obj = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("model_state_dict", "state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return _to_numpy_state(obj)


class ConvertStats:
    """What a conversion actually did — for hard assertions in tests.

    wrote:           flax paths whose values came from the checkpoint
    missing_flax:    table rows pointing at a nonexistent flax param
    missing_torch:   table rows whose torch key was absent from the ckpt
    unused_torch:    ckpt keys no table row consumed
    untouched_flax:  flax params no table row covers (kept their init)
    """

    def __init__(self, wrote, missing_flax, missing_torch, unused_torch, untouched_flax):
        self.wrote = wrote
        self.missing_flax = missing_flax
        self.missing_torch = missing_torch
        self.unused_torch = unused_torch
        self.untouched_flax = untouched_flax


def apply_mapping(
    params: Any,
    torch_state: Mapping[str, np.ndarray],
    table: Dict[tuple, tuple],
    verbose: bool = True,
    strict_shapes: bool = True,
    strict: bool = False,
    return_stats: bool = False,
):
    """Write mapped torch tensors into a (copied) flax param pytree.

    With strict=True any table row that fails to land (missing flax param or
    missing torch key) raises — the reference's "missing core" hard warning
    (utils/load_model.py:69-92) made fatal. Without it, a silent table typo
    would leave random init in place.
    """
    import jax

    flat = {
        tuple(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    new = dict(flat)
    used, wrote = set(), []
    missing_flax, missing_torch = [], []
    for fpath, (tkey, tf) in table.items():
        full = ("params",) + fpath
        if full not in flat:
            missing_flax.append("/".join(full))
            continue
        if tkey not in torch_state:
            missing_torch.append(tkey)
            continue
        w = TRANSFORMS[tf](torch_state[tkey]).astype(np.float32)
        if w.shape != flat[full].shape:
            msg = f"[convert] shape mismatch {'/'.join(full)}: torch {w.shape} vs flax {flat[full].shape}"
            if strict_shapes:
                raise ValueError(msg)
            print(msg + " — skipped")
            continue
        new[full] = w
        used.add(tkey)
        wrote.append(full)
    covered = {("params",) + f for f in table}
    stats = ConvertStats(
        wrote=wrote,
        missing_flax=missing_flax,
        missing_torch=missing_torch,
        unused_torch=[k for k in torch_state if k not in used],
        untouched_flax=["/".join(p) for p in flat if p not in covered],
    )
    # missing/unexpected-key report (reference load_model.py:69-92)
    report_load(
        [tkey for _, (tkey, _) in table.items()], list(torch_state.keys()), verbose=verbose
    )
    if verbose:
        print(f"[convert] wrote {len(wrote)}/{len(table)} mapped tensors")
        for p in missing_flax[:5]:
            print(f"[convert] no flax param at {p}")
    if strict and (missing_flax or missing_torch):
        raise ValueError(
            f"[convert] strict load failed: {len(missing_flax)} table rows with no flax "
            f"param (e.g. {missing_flax[:3]}), {len(missing_torch)} with no torch key "
            f"(e.g. {missing_torch[:3]})"
        )

    # rebuild pytree
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [
        new[tuple(str(getattr(k, "key", k)) for k in path)] for path, _ in paths
    ]
    out = jax.tree_util.tree_unflatten(treedef, leaves)
    return (out, stats) if return_stats else out


def load_viewfusion(
    params, cfg: ViewFusionConfig, path: str, verbose: bool = True,
    strict: bool = True, return_stats: bool = False,
):
    """Full ViewFusion checkpoint -> params (demo.py:161-169). strict=True by
    default: a sep23-style full checkpoint must cover every mapped tensor."""
    state = load_torch_state(path)
    return apply_mapping(
        params, state, viewfusion_mapping(cfg), verbose=verbose,
        strict=strict, return_stats=return_stats,
    )


def load_zero123_unet(
    params, cfg: ViewFusionConfig, path: str, verbose: bool = True,
    return_stats: bool = False,
):
    """zero123 SD-UNet init with full key surgery (unet.py:88-93). Not strict:
    the grafted view-attn rows are expected missing from a zero123 ckpt
    (ignore_keys semantics, viewfusion_zero_depth_rgb.py:64-69)."""
    state = load_torch_state(path)
    state = apply_surgery(
        state,
        replace_key=("model.diffusion_model.", ""),
        param_mapper=ZERO123_PARAM_MAPPER,
        remove_keys=ZERO123_REMOVE_KEYS,
        ignore_keys=("aligned_attn_",),
    )
    table = {("unet",) + k: v for k, v in unet_mapping(cfg).items()}
    return apply_mapping(params, state, table, verbose=verbose, return_stats=return_stats)


def load_sd_vae(
    params, cfg: ViewFusionConfig, path: str, verbose: bool = True,
    strict: bool = True, return_stats: bool = False,
):
    """SD VAE init (viewfusion:75, replace first_stage_model. prefix)."""
    state = load_torch_state(path)
    state = apply_surgery(state, replace_key=("first_stage_model.", ""))
    table = {("vae",) + k: v for k, v in vae_mapping(cfg).items()}
    return apply_mapping(
        params, state, table, verbose=verbose, strict=strict, return_stats=return_stats
    )


def load_zero123_cc(
    params, cfg: ViewFusionConfig, path: str, verbose: bool = True,
    return_stats: bool = False,
):
    """cc_projection source for the legacy Δ-pose path
    (weights/zero123_105000_cc.ckpt). With embed_camera_pose=False the
    reference's cc_projection is a single Linear(768+4, 768) and the ckpt's
    state_dict is loaded over the whole ViewFusion with strict=False plus an
    assert of ZERO unexpected keys (viewfusion_zero_depth_rgb.py:112-121) —
    i.e. the artifact may hold nothing but cc_projection.{weight,bias}.
    Mirrored here: maps those two tensors onto cc_layers_0 and raises if the
    ckpt contains anything else (the reference's `assert len(u) == 0`)."""
    from mvdfusion_tpu.convert.mapping import _dense

    if cfg.embed_camera_pose:
        raise ValueError(
            "zero123_cc loads the legacy Δ-pose cc_projection; the config has "
            "embed_camera_pose=True (3-layer MLP) — see viewfusion_zero_depth_rgb.py:108-121"
        )
    state = load_torch_state(path)
    table: Dict[tuple, tuple] = {}
    _dense(table, ("cc_layers_0",), "cc_projection")
    out, stats = apply_mapping(
        params, state, table, verbose=verbose, strict=True, return_stats=True
    )
    if stats.unused_torch:
        raise ValueError(
            f"[convert] zero123_cc ckpt has {len(stats.unused_torch)} keys outside "
            f"cc_projection (e.g. {stats.unused_torch[:3]}) — the reference asserts "
            "len(unexpected) == 0"
        )
    return (out, stats) if return_stats else out


def load_clip(
    params, cfg: ViewFusionConfig, path: str, verbose: bool = True,
    strict: bool = True, return_stats: bool = False,
):
    """OpenAI CLIP ViT-L/14 image tower (encoders/modules.py:414)."""
    state = load_torch_state(path)
    table = {("clip",) + k: v for k, v in clip_mapping(cfg).items()}
    return apply_mapping(
        params, state, table, verbose=verbose, strict=strict, return_stats=return_stats
    )
