"""Standalone timing for the fused transformer-site kernel (ops/block.py).

Times `transformer_block` at the three flagship site shapes (32^2 C=320
single kernel, 16^2 C=640 split kernels, and the XLA twin for each) so
kernel variants can be A/B'd on-chip without paying a full bench run.
Variants are selected via env (e.g. MVDF_BLOCK_SOFTMAX=v2) read by
ops/block.py at trace time.

Usage:  python tools/block_tune.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_weights(C: int, heads: int, key) -> "BlockWeights":
    from mvdfusion_tpu.ops.block import BlockWeights

    inner = 4 * C
    ks = jax.random.split(key, 8)
    s = lambda *sh: 0.02
    f32 = jnp.float32
    return BlockWeights(
        gn_g=jnp.ones((C,), f32),
        gn_b=jnp.zeros((C,), f32),
        pi_k=jax.random.normal(ks[0], (C, C), f32) * s(),
        pi_b=jnp.zeros((C,), f32),
        ln1_g=jnp.ones((C,), f32),
        ln1_b=jnp.zeros((C,), f32),
        qkv_k=jax.random.normal(ks[1], (3 * C, C), f32) * s(),
        out_k=jax.random.normal(ks[2], (C, C), f32) * s(),
        out_b=jnp.zeros((C,), f32),
        ln3_g=jnp.ones((C,), f32),
        ln3_b=jnp.zeros((C,), f32),
        g_k=jax.random.normal(ks[3], (2 * inner, C), f32) * s(),
        g_b=jnp.zeros((2 * inner,), f32),
        f_k=jax.random.normal(ks[4], (C, inner), f32) * s(),
        f_b=jnp.zeros((C,), f32),
        po_k=jax.random.normal(ks[5], (C, C), f32) * s(),
        po_b=jnp.zeros((C,), f32),
    )


def time_fn(fn, x, *args, iters: int = 30) -> float:
    # axon's per-materialisation RTT (~50 ms) swamps ms-scale kernels:
    # chain `iters` calls through a data dependency (out feeds the next
    # call's input) and materialise ONE scalar at the end.
    out = fn(x, *args)
    float(jnp.sum(out))  # warm/compile
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y, *args)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()

    from mvdfusion_tpu.ops.block import _xla_reference, transformer_block

    print(f"device={jax.devices()[0].device_kind}  "
          f"MVDF_BLOCK_SOFTMAX={os.environ.get('MVDF_BLOCK_SOFTMAX', 'v1')}  "
          f"MVDF_BLOCK_NB={os.environ.get('MVDF_BLOCK_NB', '1')}  "
          f"MVDF_BLOCK_SINGLE={os.environ.get('MVDF_BLOCK_SINGLE', '')}",
          file=sys.stderr)

    shapes = [
        ("32^2 site", 16, 1024, 320, 8),
        ("16^2 site", 16, 256, 640, 8),
        ("8^2 site", 16, 64, 1280, 8),
        ("4^2 middle", 16, 16, 1280, 8),
    ]
    key = jax.random.PRNGKey(0)
    for name, B, N, C, heads in shapes:
        w = make_weights(C, heads, key)
        x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
        a2 = jax.random.normal(key, (B, C), jnp.bfloat16) * 0.1

        fused = jax.jit(lambda x, a2, w: transformer_block(x, a2, w, heads))
        ref = jax.jit(lambda x, a2, w: _xla_reference(x, a2, w, heads))

        # on-chip numerics: real Mosaic lowering vs the XLA twin (interpret
        # tests cover the math; this catches compiled-lowering divergence)
        err = float(jnp.max(jnp.abs(
            fused(x, a2, w).astype(jnp.float32) - ref(x, a2, w).astype(jnp.float32)
        )))
        print(f"{name}: max|fused-xla| = {err:.3e}", file=sys.stderr)

        t_f = time_fn(fused, x, a2, w, iters=a.iters)
        t_r = time_fn(ref, x, a2, w, iters=a.iters)
        # per-site flops: matmuls + attention
        inner = 4 * C
        fl = 2 * B * N * C * (6 * C + 3 * inner) + 4 * B * N * N * C
        print(
            f"{name}: fused {t_f*1e3:7.3f} ms ({fl/t_f/1e12:6.1f} TF/s)   "
            f"xla {t_r*1e3:7.3f} ms ({fl/t_r/1e12:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()
