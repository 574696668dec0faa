"""Benchmark: views/sec for the flagship workload on one TPU chip.

Workload (BASELINE.md): 1 input view -> 8 generated novel views at 256^2
RGB-D, 50 DDIM steps, cfg 2.5 — the reference's mvd_gso.yaml eval shape with
the driver's 8-view view count. Timed region = the jitted 50-step sampling
loop + VAE decode of the 8 views (everything needed to go from a prepared
scene to images); the one-time scene preparation (VAE/CLIP encode of the
input) is excluded, matching "views/sec" for sustained generation.

The reference repo publishes no numbers (SURVEY.md §6). `vs_baseline` is
reported against a 1.0 views/sec estimate for the PyTorch reference on
A100 (50 steps x 2 sequential ~860M-param UNet passes at batch 15, 32^2
latents, fp32 + GridAttn overhead) — an estimate, flagged as such here
because there is nothing published to pin it to.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

A100_REFERENCE_VIEWS_PER_SEC_ESTIMATE = 1.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
    from mvdfusion_tpu.pipeline.sampler import ddim_sample

    n_views = 8
    img = 256
    steps = 50

    cfg = ViewFusionConfig()  # full-size flagship
    model = ViewFusion(cfg)

    rng = np.random.default_rng(0)
    S = n_views + 1
    images = jnp.asarray(rng.uniform(size=(S, img, img, 3)), jnp.float32)
    azim = np.linspace(0.0, 360.0 * (S - 1) / S, S)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90.0)
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    input_idx = jnp.asarray([0])
    target_idx = jnp.asarray(np.arange(1, S), jnp.int32)

    t0 = time.time()
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), images, R, T, f, c, input_idx, target_idx, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(params)
    print(f"[bench] init {time.time()-t0:.1f}s", file=sys.stderr)

    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    _, cams, in_lat, in_cams, clip_v = prep(params, images, R, T, f, c, input_idx, target_idx)

    decode = jax.jit(lambda p, z: model.apply(p, z, method=ViewFusion.decode_latents))

    # NOTE: on the axon remote-TPU platform block_until_ready() is async and
    # returns immediately; only materialisation forces execution. Timing
    # protocol: a jitted generate->scalar step, chained with an explicit data
    # dependency so k queued iterations cannot overlap, materialised once.
    @jax.jit
    def gen_reduce(p, key, carry):
        key = jax.random.fold_in(key, (carry * 0).astype(jnp.int32) + 1)
        res = ddim_sample(
            p, model, cams, in_lat, in_cams, clip_v, key, jnp.asarray(2.5), num_steps=steps
        )
        out = decode(p, res.latents[..., :4])
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    carry = gen_reduce(params, jax.random.PRNGKey(2), jnp.asarray(0.0))
    _ = float(carry)
    print(f"[bench] warmup(compile+upload+run) {time.time()-t0:.1f}s", file=sys.stderr)

    # per-call timing, each materialised (first post-compile calls can carry
    # residual one-time cost on this remote-TPU platform — use the median)
    times = []
    carry = jnp.asarray(0.0)
    for i in range(7):
        t0 = time.time()
        carry = gen_reduce(params, jax.random.PRNGKey(3 + i), carry)
        _ = float(carry)
        times.append(time.time() - t0)
    steady = sorted(times[2:])[len(times[2:]) // 2]  # median of calls 2..6
    per_iter = steady
    vps = n_views / per_iter
    print(f"[bench] times={['%.2f' % t for t in times]}s steady={per_iter:.3f}s views/s={vps:.3f}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "views_per_sec_8view_256px_50ddim_cfg2.5",
                "value": round(vps, 4),
                "unit": "views/s",
                "vs_baseline": round(vps / A100_REFERENCE_VIEWS_PER_SEC_ESTIMATE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
