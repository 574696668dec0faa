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

No pipeline/expert axes: the reference has no pipeline or MoE structure
(SURVEY.md §2.5); the analogous sequence axis (the V view axis inside
GridAttn) stays on-chip here and is the target of the Pallas fusion work.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than the {n} available devices"
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


def _spec_for(path: str, shape) -> P:
    ndim = len(shape)
    if ndim == 2:
        if _COLUMN.search(path) and shape[1] % 2 == 0:
            return P(None, "tp")
        if _ROW.search(path) and shape[0] % 2 == 0:
            return P("tp", None)
        return P()
    if ndim == 4:  # conv kernels (kh, kw, in, out): shard output features
        if shape[3] % 2 == 0 and shape[3] >= 8:
            return P(None, None, None, "tp")
        return P()
    return P()


def param_shardings(params, mesh: Mesh):
    """Map a param pytree to NamedShardings under `mesh`.

    Any dim not divisible by the tp axis size falls back to replication —
    the spec only has to be valid; XLA inserts collectives for correctness.
    """
    tp = mesh.shape["tp"]

    def assign(path, leaf):
        pathstr = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _spec_for(pathstr, leaf.shape)
        # verify divisibility; otherwise replicate
        ok = all(s is None or leaf.shape[i] % tp == 0 for i, s in enumerate(spec))
        if not ok:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh):
    """Sharding for batched data: leading axis over dp, rest replicated."""
    return NamedSharding(mesh, P("dp"))
