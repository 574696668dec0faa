"""Trainable-parameter masking, sharding rules, and the sharded train step
on the virtual 8-device CPU mesh (SURVEY.md §4 distributed strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
from mvdfusion_tpu.parallel.mesh import make_mesh, param_shardings
from mvdfusion_tpu.pipeline.trainer import TrainConfig, trainable_mask


def _abstract_params():
    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    S, IMG = 4, cfg.latent_size * 4
    images = jnp.zeros((S, IMG, IMG, 3))
    R = jnp.tile(jnp.eye(3)[None], (S, 1, 1))
    T = jnp.tile(jnp.asarray([[0.0, 0.0, 1.5]]), (S, 1))
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    return jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), images, R, T, f, c, jnp.asarray([0]), jnp.asarray([1, 2]),
            jax.random.PRNGKey(1), method=ViewFusion.init_all,
        )
    )


def test_trainable_mask_matches_reference_policy():
    """unet.py:558-576 + viewfusion:399-416: frozen VAE/CLIP/ResBlocks,
    trainable attention stacks / grafts / cc-projection / time-embed."""
    params = _abstract_params()
    mask = trainable_mask(params, TrainConfig())
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    # frozen towers
    assert not any(v for k, v in flat.items() if k.startswith("params/vae"))
    assert not any(v for k, v in flat.items() if k.startswith("params/clip"))
    # frozen UNet backbone (res blocks, conv_in/out, time dense)
    assert not flat["params/unet/conv_in/kernel"]
    assert not any(v for k, v in flat.items() if "/unet/" in k and "_res_" in k)
    # trainable: spatial transformers, grafted view attention, GridAttn,
    # cc projection, aux time embed
    assert all(v for k, v in flat.items() if "/unet/" in k and "attn" in k)
    assert all(v for k, v in flat.items() if k.startswith("params/view_attn"))
    assert all(v for k, v in flat.items() if k.startswith("params/cc_layers"))
    assert flat["params/time_dense1/kernel"]
    # finetune_unet=True flips the whole UNet on
    mask2 = trainable_mask(params, TrainConfig(finetune_unet=True))
    flat2 = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask2)[0]
    }
    assert flat2["params/unet/conv_in/kernel"]
    assert not flat2["params/vae/encoder/conv_in/kernel"]


def test_param_shardings_valid():
    params = _abstract_params()
    mesh = make_mesh(dp=4, tp=2)
    shardings = param_shardings(params, mesh)
    leaves_p = jax.tree.leaves(params)
    leaves_s = jax.tree.leaves(shardings, is_leaf=lambda x: hasattr(x, "spec"))
    n_sharded = 0
    for p, s in zip(leaves_p, leaves_s):
        for dim, axis in enumerate(s.spec):
            if axis is not None:
                assert p.shape[dim] % 2 == 0, (p.shape, s.spec)
                n_sharded += 1
    assert n_sharded > 50  # the big kernels must actually shard


def test_dryrun_multichip_8dev():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
