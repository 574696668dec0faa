"""Tune the fused cross-view kernel's block_tokens at the flagship shape.

The kernel (ops/crossview.py) processes TN query points per grid step; TN
sets the M dimension of every in-kernel matmul (MXU wants >=128... but VMEM
holds the (TN, HW) one-hot interpolation matrix in fp32, so bigger TN trades
MXU M-efficiency against VMEM pressure). Measures the kernel standalone at
the flagship GridAttn shape (V=8 views + input refs, N=8*32*32 query points,
HW=1024, hid=256, L=3 DiT layers) across TN values.

Timing: chained lax.scan protocol (axon async), null-subtracted.

Run:  python tools/crossview_tune.py [TN ...]

Measured on v5e (round 3): TN=64 3.62 ms, TN=128 4.00 ms, TN=256 3.68 ms,
TN=512 OOMs the 16 MB scoped VMEM (31.98M) — the shipped default TN=64 is
the measured optimum; block size is NOT the crossview kernel's remaining
headroom (the V=8 attention scaffolding is, ARCHITECTURE.md §5b).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from mvdfusion_tpu.ops.crossview import AggregatorWeights, GeoWeights, _crossview_fwd_impl

ITERS = 100


def main():
    V, H, W, hid, L, heads = 8, 32, 32, 256, 3, 8
    N = 8 * 32 * 32  # B*H*W*D query points
    G = 90 + 15 + 1
    out_dim = 768
    mlp = hid * 2  # model's viewattn_mlp_ratio=2.0
    dt = jnp.bfloat16
    r = np.random.default_rng(0)

    def mk(*s, scale=0.05):
        return jnp.asarray(r.standard_normal(s) * scale, jnp.float32)

    xy = jnp.asarray(r.uniform(-1, 1, (V, N, 2)), jnp.float32)
    pts = mk(N, 3, scale=1.0)
    centers = mk(V, 3, scale=1.0)
    mask = jnp.ones((V,), jnp.float32)
    b_acc = mk(N, hid, scale=1.0)
    maps_p = mk(V, H, W, hid, scale=1.0).astype(dt)
    nh = 7
    kgeo = GeoWeights(kall=mk(7 * (1 + 2 * nh), hid), kmask=mk(1, hid))
    freqs = tuple(float(0.1 * 2.0**k) for k in range(nh))
    w = AggregatorWeights(
        qkv_k=mk(L, hid, 3 * hid), qkv_b=mk(L, 3 * hid),
        proj_k=mk(L, hid, hid), proj_b=mk(L, hid),
        fc1_k=mk(L, hid, mlp), fc1_b=mk(L, mlp),
        fc2_k=mk(L, mlp, hid), fc2_b=mk(L, hid),
        mods=mk(L, 6, hid), wl_k=mk(hid, 1), wl_b=mk(1),
        fin_k=mk(hid, out_dim), fin_b=mk(out_dim),
    )

    def timed(body):
        @jax.jit
        def run(seed):
            def step(carry, _):
                out = body(b_acc + carry)
                return jnp.sum(out).astype(jnp.float32) * 1e-30, None

            carry, _ = jax.lax.scan(step, seed, None, length=ITERS)
            return carry

        _ = float(run(jnp.zeros((), jnp.float32)))
        t0 = time.time()
        _ = float(run(jnp.zeros((), jnp.float32)))
        return (time.time() - t0) / ITERS

    t_null = timed(lambda b: b[:1, :1] * 2.0)
    print(f"device={jax.devices()[0].device_kind} N={N} V={V} hid={hid} null={t_null*1e6:.0f}u")
    tns = tuple(int(a) for a in sys.argv[1:]) or (32, 64, 128, 256)
    for tn in tns:
        t = timed(
            lambda b, tn=tn: _crossview_fwd_impl(
                xy, pts, centers, mask, b, maps_p, kgeo, w, heads,
                block_tokens=tn, freqs=freqs,
            )
        ) - t_null
        print(f"  TN={tn:4d}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
