"""A/B the fused GN+SiLU+conv3x3 halo-DMA kernel (ops/conv3x3.py) against
the production XLA chain (GroupNorm32+SiLU -> nn.Conv-equivalent) at the VAE
decoder's real shapes, using the sequential-scan timing protocol (axon
dispatch overhead would otherwise floor every sample at ~2 ms).

Run on the TPU:  python tools/conv3x3_tune.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvdfusion_tpu.ops.conv3x3 import gn_fold_affine, gn_silu_conv3x3

# (B, H, W, Cin, Cout, count) — VAE decoder resblock convs for an 8-view
# decode chunk (model.py:462-577 tower at ch=128, mult [1,2,4,4]).
SHAPES = [
    (8, 64, 64, 512, 512, 7),
    (8, 128, 128, 512, 512, 4),
    (8, 128, 128, 512, 256, 1),
    (8, 128, 128, 256, 256, 2),
    (8, 256, 256, 256, 256, 1),
    (8, 256, 256, 256, 128, 1),
    (8, 256, 256, 128, 128, 5),
]

# UNet ResBlock convs in the CFG denoising step (B = 2*8 views), where the
# step_trace shows the up-path modules 1.5-2.3x above their conv rooflines
# (up_0_res_0 1.14 ms vs ~0.5). K = 9*Cin is large here (5760-8640), the
# whole tile + taps fit VMEM — the regime where the halo kernel should win.
UNET_SHAPES = [
    # NOTE: the kernel's channel-dim VMEM slicing requires Cin % 128 == 0
    # (Mosaic "slice along dim 2 must be aligned to tiling (128)"), so the
    # 960- and 320-Cin up-path convs can't use it at all; only the aligned
    # shapes are listed. should_fuse_conv3x3 already rejects C % 128 != 0.
    (16, 32, 32, 640, 320, 2),
    (16, 16, 16, 1920, 640, 1),
    (16, 16, 16, 1280, 640, 2),
    (16, 16, 16, 640, 640, 3),
]

ITERS = 50


def timed_scan(body, x, extra):
    @jax.jit
    def run(x, seed):
        def step(carry, _):
            y = body(x + carry.astype(x.dtype))
            return jnp.sum(y).astype(jnp.float32) * 1e-30, None

        carry, _ = jax.lax.scan(step, seed, None, length=ITERS)
        return carry

    out = run(x, jnp.zeros((), jnp.float32))
    _ = float(out)
    t0 = time.time()
    _ = float(run(x, jnp.zeros((), jnp.float32)))
    return time.time() - t0


def main():
    shapes = UNET_SHAPES if "--unet" in sys.argv else SHAPES
    dt = jnp.bfloat16
    print(f"device={jax.devices()[0].device_kind} iters={ITERS}")
    print(f"{'shape':>26} {'chain':>9} {'fused':>9}   TFLOP/s (chain/fused)  speedup")
    tot_chain = tot_fused = 0.0
    for B, H, W, Cin, Cout, count in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)) * 0.5, dt)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.02, dt)
        scale = jnp.asarray(rng.standard_normal(Cin) * 0.3 + 1.0, jnp.float32)
        gbias = jnp.asarray(rng.standard_normal(Cin) * 0.1, jnp.float32)
        cbias = jnp.asarray(rng.standard_normal(Cout) * 0.05, jnp.float32)
        zrow = jnp.zeros((B, Cout), jnp.float32)

        def chain(x):
            # production path: fp32 GroupNorm stats + SiLU, then XLA conv
            f32 = x.astype(jnp.float32).reshape(B, H * W, 32, Cin // 32)
            mu = jnp.mean(f32, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(f32), axis=(1, 3), keepdims=True) - mu * mu
            h = ((f32 - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(B, H, W, Cin)
            h = h * scale + gbias
            h = h * jax.nn.sigmoid(h)
            y = jax.lax.conv_general_dilated(
                h.astype(dt), w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return (y + cbias).astype(dt)

        def fused(x):
            a, b = gn_fold_affine(x.reshape(B, H * W, Cin), scale, gbias, 32, 1e-6)
            return gn_silu_conv3x3(x, a, b, w, cbias, zrow, None)

        t_null = timed_scan(lambda x: x[..., :1] * 2.0, x, None)
        tc = max((timed_scan(chain, x, None) - t_null) / ITERS, 1e-9)
        tf = max((timed_scan(fused, x, None) - t_null) / ITERS, 1e-9)
        fl = 2 * B * H * W * 9 * Cin * Cout
        tot_chain += tc * count
        tot_fused += tf * count
        print(
            f"{(B,H,W,Cin,Cout)!s:>26} {tc*1e6:8.0f}u {tf*1e6:8.0f}u   "
            f"{fl/tc/1e12:5.0f}/{fl/tf/1e12:<5.0f}  {tc/tf:.2f}x  (x{count})"
        )
    print(
        f"{'weighted total/decode':>26} {tot_chain*1e3:8.2f}m {tot_fused*1e3:8.2f}m"
        f"   speedup {tot_chain/tot_fused:.2f}x"
    )


if __name__ == "__main__":
    main()
