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
