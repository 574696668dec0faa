"""Small shared helpers (utils/common_utils.py counterparts)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] with clipping (common_utils.py:60-64)."""
    return jnp.clip(x * 2.0 - 1.0, -1.0, 1.0)


def unnormalize(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] with clipping (common_utils.py:66-70)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def split_list(a, n: int):
    """Split a list into n contiguous parts (common_utils.py:72-83), used for
    rank-sharding an eval scene list."""
    k, m = divmod(len(a), n)
    return [a[i * k + min(i, m) : (i + 1) * k + min(i + 1, m)] for i in range(n)]


def cast_inference_params(params, dtype=jnp.bfloat16):
    """Cast the big tower weights to the compute dtype ONCE, host-side.

    Inside a jitted 50-step sampler the f32->bf16 weight converts (flax
    modules cast params at use) should be loop-invariant, but the per-step
    device trace shows recurring f32 weight copy/slice ops feeding the
    Pallas custom calls — XLA's while-loop LICM does not hoist them all.
    Pre-casting removes the f32 source entirely and halves the weight bytes
    the loop touches.

    Norm parameters (any path segment containing "norm", e.g. GroupNorm_0,
    norm1/2/3, LayerNorm) and the small fp32 modules (time embedding,
    cc_projection) keep f32 — they are consumed in the fp32 islands.
    Exactly the numerics of the bf16 compute path: flax would cast these
    same weights to the module dtype at every use anyway."""
    import jax

    def cast(path, leaf):
        keys = [str(getattr(k, "key", k)).lower() for k in path]
        if any("norm" in k for k in keys):
            return leaf
        if len(keys) >= 2 and keys[1] in ("time_dense1", "time_dense2", "cc_layers"):
            return leaf
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)
