"""Device mesh + sharding rules.

The reference's distribution story is NCCL DDP (train.py:32-38) and
embarrassingly-parallel eval sharding (demo.py:63-65). The TPU-native
counterpart is one SPMD program over a `jax.sharding.Mesh`:

  * `dp` axis — scenes (data parallel). Gradients are combined by XLA's
    automatic all-reduce when the jitted loss averages over the sharded
    scene axis; no explicit collectives in user code.
  * `tp` axis — tensor parallelism inside the UNet/CLIP towers
    (Megatron-style column/row sharding of the big Dense/conv kernels).
    XLA inserts the matching all-gathers/reduce-scatters over ICI.

  * `sp` axis (optional) — view parallelism: the per-scene TARGET-VIEW
    axis. The UNet/VAE towers treat each target view as an independent
    batch element, so their work shards cleanly over sp. GridAttn does
    NOT: it gathers features from and attends across ALL V target views
    (nn/viewattn.py — every query point samples every view's embedded
    latent, matching view_attn_efficient2.py:310-316,389-397), so GSPMD
    must insert cross-view collectives (all-gathers of the per-view
    latents/features) at the GridAttn boundary every step. Correctness is
    the partitioner's (sp-vs-single-device loss parity:
    tests/test_parallel_and_train.py::test_sp_view_parallel_train_step);
    the communication cost is real and measured by
    tools/sp_collectives.py — sp pays off only when the per-view UNet
    work dominates the gathered-feature traffic.

No pipeline/expert axes: the reference has no pipeline or MoE structure
(SURVEY.md §2.5); pp/ep have no semantic counterpart in this model. The
remaining sequence axis (the V input-view axis inside GridAttn) stays
on-chip and is the target of the Pallas fusion work.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp[, sp], tp) mesh over the available devices.

    `sp` > 1 adds a view-parallel axis between dp and tp: the per-scene
    TARGET-VIEW axis shards over it. The UNet/VAE per-view work scales
    like dp scales scenes, but GridAttn attends across ALL target views,
    so the partitioner inserts cross-view all-gathers at its boundary
    (see module docstring; cost measured by tools/sp_collectives.py).
    With sp == 1 the mesh is the classic 2-axis (dp, tp) shape."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    assert dp * tp * sp <= n, f"mesh {dp}x{sp}x{tp} needs more than the {n} available devices"
    if sp > 1:
        return Mesh(
            np.asarray(devices[: dp * sp * tp]).reshape(dp, sp, tp),
            axis_names=("dp", "sp", "tp"),
        )
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), axis_names=("dp", "tp"))


# Megatron-style rules: (path regex, spec for 2D kernels). Column-parallel
# layers (qkv / up-projections) shard the OUTPUT dim; the row-parallel
# layers that immediately consume them (attention out / MLP down) shard the
# INPUT dim, so XLA's collective is a single reduce-scatter/all-reduce pair
# per block instead of per-matmul gathers.
_COLUMN = re.compile(
    r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|qkv|mlp_fc|fc1|geglu|emb_proj|time_dense1|adaLN)"
)
_ROW = re.compile(r"(to_out|out_proj|proj$|mlp_proj|fc2|/out/|time_dense2)")

# Fused-kernel exception: the Pallas transformer-site kernels (ops/block.py)
# and the GridAttn kernel (ops/crossview.py) consume their weight tensors
# WHOLE inside the kernel, so tp-sharding those weights would make GSPMD
# all-gather them every step — pure ICI cost with zero matmul-time benefit.
# They stay replicated. The fused site gate engages only where C <= 768
# (should_fuse_block), i.e. every affected tensor has min(dim) <= 768; the
# replication cost is ~15 MB of bf16 weights per chip — negligible. The
# C=1280 sites (min dim 1280) never fuse and keep the Megatron sharding.
# Decision + measurement notes: docs/ARCHITECTURE.md §6.
_FUSED_SITE = re.compile(r"(mid_attn|down_\d+_attn_\d+|up_\d+_attn_\d+)/")
_FUSED_MIN_DIM = 768


def _spec_for(path: str, shape, tp: int = 2) -> P:
    """Sharding spec for one param under a tp-way tensor-parallel axis.

    The divisibility gates use the ACTUAL tp size so the regex intent and
    the final sharding agree (a tp=4 mesh must not claim P(None, "tp") for a
    dim divisible by 2 but not 4 and then get silently replicated later)."""
    ndim = len(shape)
    if path.startswith("params/view_attn"):
        # GridAttn weights ride whole into the fused crossview kernel
        return P()
    if ndim == 2:
        if _FUSED_SITE.search(path) and min(shape) <= _FUSED_MIN_DIM:
            return P()
        if _COLUMN.search(path) and shape[1] % tp == 0:
            return P(None, "tp")
        if _ROW.search(path) and shape[0] % tp == 0:
            return P("tp", None)
        return P()
    if ndim == 4:  # conv kernels (kh, kw, in, out): shard output features
        if shape[3] % tp == 0 and shape[3] >= 4 * tp:
            return P(None, None, None, "tp")
        return P()
    return P()


def param_shardings(params, mesh: Mesh):
    """Map a param pytree to NamedShardings under `mesh`."""
    tp = mesh.shape["tp"]

    def assign(path, leaf):
        pathstr = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, _spec_for(pathstr, leaf.shape, tp))

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh):
    """Sharding for batched data: leading axis over dp, rest replicated."""
    return NamedSharding(mesh, P("dp"))
