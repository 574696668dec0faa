"""Microbenchmark: 3x3 conv formulations at the UNet's flagship shapes.

The profiled denoising step is conv-bound (README: conv fusions 24.4 ms/step,
measured 87-116 TFLOP/s vs the v5e 197 TFLOP/s matmul peak). This tool
measures, per conv shape in the UNet forward:

  a) XLA native conv      — lax.conv_general_dilated NHWC (what nn.Conv does)
  b) im2col + one matmul  — 9 shifted slices concat -> (BHW, 9C) @ (9C, Cout)
  c) 9 shifted matmuls    — sum_{di,dj} shift(x) @ W[di,dj]

to decide whether a matmul formulation (plain XLA or a Pallas kernel) can
beat the XLA conv emitter at these shapes.

Timing protocol (axon remote TPU: block_until_ready is async): each variant
runs ITERS times inside ONE jitted lax.scan whose carry perturbs the input,
so iterations are strictly sequential on-device; the final scalar is
materialized to the host. Per-iteration time = (t_scan - t_null) / ITERS,
where t_null is the same scan with the conv replaced by a cheap op.

Run on the TPU:  python tools/conv_microbench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


# (B, H, W, Cin, Cout, count) — count = occurrences in one UNet forward.
SHAPES = [
    (16, 32, 32, 320, 320, 7),
    (16, 32, 32, 640, 320, 3),
    (16, 16, 16, 320, 640, 2),
    (16, 16, 16, 640, 640, 5),
    (16, 16, 16, 960, 640, 1),
    (16, 16, 16, 1280, 640, 1),
    (16, 8, 8, 640, 1280, 2),
    (16, 8, 8, 1280, 1280, 5),
    (16, 8, 8, 1920, 1280, 2),
    (16, 4, 4, 1280, 1280, 10),
    (16, 4, 4, 2560, 1280, 3),
]

ITERS = 200


def timed_scan(body, x, w):
    """Run body ITERS times sequentially in one compiled program; return
    wall seconds for the whole scan (host-materialized)."""

    @jax.jit
    def run(x, w, seed):
        def step(carry, _):
            y = body(x + carry.astype(x.dtype), w)
            return jnp.sum(y).astype(jnp.float32) * 1e-30, None

        carry, _ = jax.lax.scan(step, seed, None, length=ITERS)
        return carry

    out = run(x, w, jnp.zeros((), jnp.float32))
    _ = float(out)  # compile+warm
    t0 = time.time()
    _ = float(run(x, w, jnp.zeros((), jnp.float32)))
    return time.time() - t0


def main():
    dt = jnp.bfloat16
    total = {"conv": 0.0, "im2col": 0.0, "shift9": 0.0}
    print(f"device={jax.devices()[0].device_kind} iters={ITERS}")
    print(f"{'shape':>28} {'conv':>9} {'im2col':>9} {'shift9':>9}   TFLOP/s (conv/im2col/shift9)")
    for B, H, W, Cin, Cout, count in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.02, dt)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(dt)

        def im2col(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [
                xp[:, di : di + H, dj : dj + W, :]
                for di in range(3)
                for dj in range(3)
            ]
            patches = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * Cin)
            y = jax.lax.dot_general(
                patches, w.reshape(9 * Cin, Cout),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            return y.reshape(B, H, W, Cout).astype(dt)

        def shift9(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((B, H, W, Cout), jnp.float32)
            for di in range(3):
                for dj in range(3):
                    sl = xp[:, di : di + H, dj : dj + W, :]
                    acc = acc + jax.lax.dot_general(
                        sl.reshape(B * H * W, Cin), w[di, dj],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(B, H, W, Cout)
            return acc.astype(dt)

        def null(x, w):
            return x[..., :1] * 2.0

        t_null = timed_scan(null, x, w)
        flops = 2 * B * H * W * 9 * Cin * Cout
        res = {}
        for name, fn in [("conv", conv), ("im2col", im2col), ("shift9", shift9)]:
            t = (timed_scan(fn, x, w) - t_null) / ITERS
            res[name] = max(t, 1e-9)
            total[name] += res[name] * count
        tf = {k: flops / v / 1e12 for k, v in res.items()}
        print(
            f"{(B,H,W,Cin,Cout)!s:>28} {res['conv']*1e6:8.0f}u {res['im2col']*1e6:8.0f}u "
            f"{res['shift9']*1e6:8.0f}u   {tf['conv']:.0f}/{tf['im2col']:.0f}/{tf['shift9']:.0f}"
        )
    print(
        f"{'weighted total/step':>28} "
        f"{total['conv']*1e3:7.2f}ms {total['im2col']*1e3:7.2f}ms {total['shift9']*1e3:7.2f}ms"
    )


if __name__ == "__main__":
    main()
