"""On-chip kernel-vs-XLA numerics check.

The interpret-mode tests (tests/test_ops_*.py) prove each Pallas kernel
against its XLA twin on CPU; this tool proves the same on REAL TPU hardware
through the whole model: it traces `apply_model_cfg` twice — once with the
fused kernels, once with MVDF_DISABLE_PALLAS=1 forcing every site onto the
XLA path — and reports the max |diff| of the CFG-guided noise prediction.
bf16 towers with fp32 islands: expected agreement is ~1e-2 absolute on
unit-scale outputs (bf16 resolution), not 1e-5.

Run: python -m mvdfusion_tpu.tools.tpu_numerics_check
"""

from __future__ import annotations

import os

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig

    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    rng = np.random.default_rng(0)
    S, IMG = 6, cfg.latent_size * 4
    images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
    R, T = look_at_view_transform(
        dist=1.5, elev=30.0, azim=np.linspace(0.0, 300.0, S) + 90.0
    )
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    input_idx, target_idx = jnp.asarray([0]), jnp.asarray([1, 3, 5])

    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), images, R, T, f, c, input_idx, target_idx,
        jax.random.PRNGKey(1),
    )
    # perturb every param: zero-initialized output convs (reference
    # zero_module semantics) would otherwise make the whole check vacuous
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        l + 0.03 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    lat, cams, in_lat, in_cams, clip_v = prep(
        params, images, R, T, f, c, input_idx, target_idx
    )
    B = clip_v.shape[0]
    x = jnp.asarray(rng.normal(size=lat.shape), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    jitter = jnp.asarray(
        rng.normal(size=(B, cfg.latent_size, cfg.latent_size, cfg.n_pts_per_ray)),
        jnp.float32,
    )

    def run():
        # fresh trace per env state: the should_fuse gates read the env var
        # at trace time, so each call must compile its own executable
        fn = jax.jit(
            lambda p, x: model.apply(
                p, x, cams, in_lat, in_cams, clip_v, t, jax.random.PRNGKey(0),
                jnp.asarray(2.5), attn_jitter_noise=jitter,
                method=ViewFusion.apply_model_cfg,
            )
        )
        return np.asarray(fn(params, x))

    os.environ.pop("MVDF_DISABLE_PALLAS", None)
    fused = run()
    os.environ["MVDF_DISABLE_PALLAS"] = "1"
    xla = run()
    os.environ.pop("MVDF_DISABLE_PALLAS", None)

    err = np.abs(fused - xla)
    scale = np.abs(xla).max()
    print(
        f"apply_model_cfg fused-vs-XLA on {jax.devices()[0].device_kind}: "
        f"max|diff|={err.max():.5f} mean|diff|={err.mean():.6f} "
        f"(output scale {scale:.3f})"
    )
    assert np.isfinite(fused).all() and np.isfinite(xla).all()
    assert err.max() < 0.05 * max(scale, 1.0), "kernel/XLA divergence too large"
    print("OK")


if __name__ == "__main__":
    main()
