"""Training step: optax AdamW over the reference's trainable-parameter set,
scene-batched and SPMD-sharded.

Reference counterparts:
  * optimizer groups (viewfusion_zero_depth_rgb.py:399-416): cc_projection,
    trainable-UNet subset, time_embed, view_attn — all at the same lr, so a
    single masked AdamW is exactly equivalent.
  * trainable-UNet subset (mvdfusion/unet.py:558-576): with
    finetune_unet=False the trainable UNet params are the SpatialTransformer
    stacks (finetune_cross_attn) and the grafted view-aligned layers
    (finetune_view_attn); everything else is frozen. VAE and CLIP are always
    frozen (viewfusion:103-105, vae loaded eval-only).
  * gradient accumulation: the reference config declares grad_accum_step
    but train.py never reads it (SURVEY.md §2.5); here it is implemented
    honestly via optax.MultiSteps.
  * DDP all-reduce (train.py:94): under jit over a dp-sharded scene batch
    the mean loss's gradient IS the all-reduced gradient — XLA inserts the
    psum over ICI.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mvdfusion_tpu.nn.viewfusion import ViewFusion


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """trainer section of the YAML (configs/mvd_train.yaml:87-94)."""

    lr: float = 1e-4
    grad_accum_step: int = 1
    finetune_projection: bool = True
    finetune_unet: bool = False
    finetune_cross_attn: bool = True
    finetune_view_attn: bool = True
    weight_decay: float = 0.01  # torch AdamW default
    # Training-hygiene rails, both OFF by default (the reference trainer has
    # neither, train.py:27-214): global-norm gradient clipping, and skipping
    # parameter updates on non-finite gradients (optax.apply_if_finite) so a
    # single bad step cannot poison the weights.
    grad_clip: float = 0.0
    skip_nonfinite: bool = False
    # Learning-rate schedule over optimizer steps: "constant" (the reference,
    # train.py:95) or "cosine" (optax.cosine_decay_schedule over
    # lr_decay_steps to lr*lr_alpha — the stabilizer the learning proof
    # needed, docs/LEARNING.md). `lr` may also be given directly as an optax
    # schedule callable, which wins over these keys.
    lr_schedule: str = "constant"
    lr_decay_steps: int = 0
    lr_alpha: float = 0.1
    # Parameter EMA for eval, OFF by default (0.0). When > 0, TrainState
    # carries an `ema` pytree updated every step with the warmup decay
    # min(ema_decay, (1+t)/(10+t)) so short runs track live params instead
    # of the init. The reference has no EMA (it finetunes a pretrained
    # init); a from-scratch run samples far more stably from the average.
    ema_decay: float = 0.0
    # Storage dtype for the FROZEN towers' master weight matrices (VAE/CLIP
    # and any other never-updated leaf, per trainable_mask). "auto" stores
    # them in bf16 when the model computes in bf16 — bit-identical loss,
    # because those kernels are cast to the compute dtype at every use
    # anyway — and keeps f32 otherwise (the tiny/small CPU test configs
    # compute in f32, where bf16 storage WOULD change numerics). Only
    # ndim>=2 leaves are cast: 1-D scales/biases stay f32 so fp32-island
    # norms (GroupNorm32/LayerNormFp32) read exact parameters. On the
    # flagship this is ~0.8 GB of a 16 GB chip; the reference never faces
    # the question (full-f32 training on 40 GB A100s, train.py:27-214).
    frozen_master_dtype: str = "auto"  # auto | float32 | bfloat16
    # Pallas dispatch INSIDE the train step. "never" (default): the train
    # step runs the plain-XLA path even where the sampling path fuses —
    # measured on v5e at the configured recipe (4 scenes/chip/step,
    # bench.py --fused-ab, TRAIN_BENCH.json round 5): all-XLA 2.76 steps/s
    # vs fused 2.35 (round 4 at 1 scene: 6.22 vs 5.76; at 1 scene round 5
    # the A/B is within the ±12% run-to-run noise of a 0.15 s step). The
    # fused kernels' custom VJPs rematerialize their backward through the
    # XLA twin, so training pays kernel-fwd + twin-fwd + twin-bwd;
    # XLA-everywhere pays twin-fwd once and lets the compiler share
    # fwd/bwd work. The 50-step SAMPLER (no gradients) keeps the kernels,
    # where they win +12 ms/step. "model": inherit the model's own
    # fuse_mode (kernel-in-train tests, A/B).
    train_fuse_mode: str = "never"  # never | model


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA of params (same tree), or None when TrainConfig.ema_decay == 0
    ema: Any = None


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


# Explicit site-name patterns matching nn/unet.py's module naming — an
# allowlist, so a future module that merely contains "attn" in its name
# cannot silently become trainable (the reference selects by key substring,
# unet.py:558-570; we select by exact grafted/spatial site names).
_GRAFTED_SITE = re.compile(r"^(mid_view_attn|up_\d+_view_attn_\d+)$")
_SPATIAL_SITE = re.compile(r"^(mid_attn|down_\d+_attn_\d+|up_\d+_attn_\d+)$")


def trainable_mask(params, tc: TrainConfig):
    """True for parameters the reference optimizes (unet.py:558-576,
    viewfusion:399-416)."""

    def decide(path, leaf):
        p = _path_str(path)
        if p.startswith("params/vae") or p.startswith("params/clip"):
            return False
        if p.startswith("params/view_attn"):
            return tc.finetune_view_attn
        if p.startswith("params/time_dense"):
            return True
        if p.startswith("params/cc_layers"):
            return tc.finetune_projection
        if p.startswith("params/unet"):
            if tc.finetune_unet:
                return True
            site = p.split("/")[2] if p.count("/") >= 2 else ""
            if _GRAFTED_SITE.match(site):  # grafted ViewAlignedFeatureTransformer
                return tc.finetune_view_attn
            if _SPATIAL_SITE.match(site):  # SpatialTransformer stacks (norm/proj/blocks)
                return tc.finetune_cross_attn
            return False
        return False

    return jax.tree_util.tree_map_with_path(decide, params)


def learning_rate(tc: TrainConfig):
    """tc.lr as a scalar or optax schedule per tc.lr_schedule."""
    if callable(tc.lr):
        return tc.lr
    if tc.lr_schedule == "cosine":
        if tc.lr_decay_steps <= 0:
            raise ValueError("lr_schedule=cosine requires lr_decay_steps > 0")
        return optax.cosine_decay_schedule(tc.lr, tc.lr_decay_steps, alpha=tc.lr_alpha)
    if tc.lr_schedule != "constant":
        raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r}")
    return tc.lr


def make_optimizer(params, tc: TrainConfig) -> optax.GradientTransformation:
    mask = trainable_mask(params, tc)
    opt = optax.adamw(
        learning_rate(tc), b1=0.9, b2=0.999, eps=1e-8, weight_decay=tc.weight_decay
    )
    if tc.grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_clip), opt)
    # optax.masked passes UNMASKED gradients through as raw updates — today
    # the frozen towers' grads are exactly zero (the stop_gradient in
    # p_losses, nn/viewfusion.py:435), but freezing must not depend on that:
    # explicitly zero the frozen subtree's updates.
    inv_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    opt = optax.chain(
        optax.masked(opt, mask), optax.masked(optax.set_to_zero(), inv_mask)
    )
    if tc.skip_nonfinite:
        opt = optax.apply_if_finite(opt, max_consecutive_errors=100)
    if tc.grad_accum_step > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=tc.grad_accum_step)
    return opt


def init_train_state(params, tc: TrainConfig, model=None) -> TrainState:
    want = tc.frozen_master_dtype
    if want == "auto":
        mdt = getattr(getattr(model, "cfg", None), "dtype", None)
        want = "bfloat16" if mdt == jnp.bfloat16 else "float32"
    if want == "bfloat16":
        mask = trainable_mask(params, tc)
        params = jax.tree_util.tree_map(
            lambda p, m: p.astype(jnp.bfloat16)
            if (not m and hasattr(p, "ndim") and p.ndim >= 2
                and p.dtype == jnp.float32)
            else p,
            params, mask,
        )
    opt = make_optimizer(params, tc)
    # fresh EMA buffers: train steps donate the state, which would
    # invalidate an ema that merely aliases params
    ema = jax.tree_util.tree_map(jnp.copy, params) if tc.ema_decay > 0 else None
    return TrainState(
        params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32), ema=ema
    )


def eval_params(state: TrainState):
    """The parameters eval should sample with: the EMA when tracked."""
    return state.params if state.ema is None else state.ema


def scene_batch_loss(
    model: ViewFusion,
    params,
    batch: dict,
    rng: jax.Array,
) -> jnp.ndarray:
    """Mean p_losses over a leading scene axis.

    batch arrays: images (N, S, H, W, 3), R (N, S, 3, 3), T (N, S, 3),
    f/c (N, S, 2), input_idx (N, 1), target_idx (N, B), optional depths.
    The reference trains 1 scene/GPU/step (train.py:87); batching scenes and
    sharding the N axis over `dp` is the TPU equivalent of DDP.
    """
    n_scenes = batch["images"].shape[0]
    rngs = jax.random.split(rng, n_scenes)

    def one(images, R, T, f, c, input_idx, target_idx, depths, r):
        return model.apply(
            params, images, R, T, f, c, input_idx, target_idx, r, depths=depths,
            method=ViewFusion.p_losses,
        )

    depths = batch.get("depths")
    if depths is None:
        one_fn = lambda im, R, T, f, c, ii, ti, r: one(im, R, T, f, c, ii, ti, None, r)
        losses = jax.vmap(one_fn)(
            batch["images"], batch["R"], batch["T"], batch["f"], batch["c"],
            batch["input_idx"], batch["target_idx"], rngs,
        )
    else:
        losses = jax.vmap(one)(
            batch["images"], batch["R"], batch["T"], batch["f"], batch["c"],
            batch["input_idx"], batch["target_idx"], depths, rngs,
        )
    return jnp.mean(losses)


def make_train_step(model: ViewFusion, tc: TrainConfig):
    """Returns a jittable (state, batch, rng) -> (state, loss)."""
    if tc.train_fuse_mode != "model" and model.cfg.fuse_mode != tc.train_fuse_mode:
        import dataclasses

        model = ViewFusion(
            dataclasses.replace(model.cfg, fuse_mode=tc.train_fuse_mode)
        )

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        optimizer = make_optimizer(state.params, tc)
        loss, grads = jax.value_and_grad(lambda p: scene_batch_loss(model, p, batch, rng))(
            state.params
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if tc.ema_decay > 0 and ema is not None:
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(tc.ema_decay, (1.0 + t) / (10.0 + t))
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params
            )
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1, ema=ema),
            loss,
        )

    return train_step
