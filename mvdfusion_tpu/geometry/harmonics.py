"""Harmonic (NeRF-style positional) embedding as a pure function.

Mirrors the PyTorch3D HarmonicEmbedding fork at utils/common_utils.py:161-271:
logspace frequencies 2^k * omega0, output layout [sin(all), cos(all), x].
The reference instantiates it with n=7, omega0=0.1, append_input=True, so a
d-dim input embeds to d*15 dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def harmonic_frequencies(n_harmonic: int = 7, omega0: float = 0.1, logspace: bool = True) -> jnp.ndarray:
    if logspace:
        freqs = 2.0 ** np.arange(n_harmonic, dtype=np.float32)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_harmonic - 1), n_harmonic, dtype=np.float32)
    return jnp.asarray(freqs * omega0)


def harmonic_embed(
    x: jnp.ndarray,
    n_harmonic: int = 7,
    omega0: float = 0.1,
    append_input: bool = True,
) -> jnp.ndarray:
    """[..., d] -> [..., d * (2*n_harmonic + append_input)].

    Layout matches common_utils.py:237-243: the frequency axis is interleaved
    per input dim — embed[..., i*n + k] = sin(f_k * x[..., i]) — then all
    cosines, then (optionally) the raw input.
    """
    freqs = harmonic_frequencies(n_harmonic, omega0)
    xf = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    parts = [jnp.sin(xf), jnp.cos(xf)]
    if append_input:
        parts.append(x)
    return jnp.concatenate(parts, axis=-1)


def harmonic_output_dim(input_dims: int, n_harmonic: int = 7, append_input: bool = True) -> int:
    return input_dims * (2 * n_harmonic + int(append_input))
