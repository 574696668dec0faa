"""Standalone A/B timing for ops/attention.py kernel orientations.

Times `fused_attention` at the stretch shape's attn1 sites (64^2 latents:
B=16 CFG batch, N=4096 tokens, 8 heads of dh=40 — the lane-limited shape
docs/ARCHITECTURE.md §5b measures at 8.3 ms/site vs a 5.6 ms ceiling) in
both orientations: natural (MVDF_ATTN_T=0) and transposed (=1, dh on
sublanes), plus the XLA einsum path. Also covers the flagship-adjacent
shapes that pass the should_fuse gate so a default flip can't silently
regress them.

Usage:  python tools/attn_tune.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_chained(fn, q, k, v, iters: int) -> float:
    # axon's per-materialisation RTT swamps ms-scale kernels: chain calls
    # through a data dependency (out feeds q) and materialise ONE scalar.
    out = fn(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))  # warm/compile
    t0 = time.perf_counter()
    y = q
    for _ in range(iters):
        y = fn(y, k, v)
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--filter", default="", help="substring filter on shape name")
    ap.add_argument(
        "--norms", default="pv",
        help="comma list of MVDF_ATTN_NORM modes to A/B (pv,probs)",
    )
    a = ap.parse_args()

    from mvdfusion_tpu.ops.attention import _xla_attention, fused_attention

    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    shapes = [
        # (name, B, Nq, Nk, H, dh)
        ("stretch 64^2 attn1", 16, 4096, 4096, 8, 40),
        ("stretch 64^2 attn2(k=1)-like", 16, 4096, 128, 8, 40),
        ("flagship VAE mid 32^2", 1, 1024, 1024, 1, 512),
        ("flagship VAE mid decode B=8", 8, 1024, 1024, 1, 512),
        ("stretch VAE mid 64^2", 1, 4096, 4096, 1, 512),
    ]
    key = jax.random.PRNGKey(0)
    for name, B, Nq, Nk, H, dh in shapes:
        if a.filter and a.filter not in name:
            continue
        kq, kk, kv = jax.random.split(key, 3)
        q = (jax.random.normal(kq, (B, Nq, H, dh), jnp.float32)).astype(jnp.bfloat16)
        k = (jax.random.normal(kk, (B, Nk, H, dh), jnp.float32)).astype(jnp.bfloat16)
        v = (jax.random.normal(kv, (B, Nk, H, dh), jnp.float32)).astype(jnp.bfloat16)
        scale = dh**-0.5
        rows = []
        for norm in a.norms.split(","):
            os.environ["MVDF_ATTN_NORM"] = norm  # read at trace time
            for tag, env in [("natural", "0"), ("transposed", "1")]:
                os.environ["MVDF_ATTN_T"] = env
                # fresh jit per env state: the orientation gate reads the env at
                # trace time, so a cached trace would ignore the flip
                fn = jax.jit(lambda q, k, v, s=scale: fused_attention(q, k, v, s))
                ms = time_chained(fn, q, k, v, a.iters) * 1e3
                rows.append((f"{tag}/{norm}", ms))
        fn = jax.jit(lambda q, k, v, s=scale: _xla_attention(q, k, v, s))
        rows.append(("xla", time_chained(fn, q, k, v, a.iters) * 1e3))
        flops = 4 * B * H * Nq * Nk * dh
        for tag, ms in rows:
            print(
                f"{name:32s} {tag:10s} {ms:8.3f} ms  "
                f"{flops / (ms * 1e-3) / 1e12:6.1f} TFLOP/s"
            )


if __name__ == "__main__":
    main()
