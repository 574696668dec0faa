"""Round-trip for the fourth weight artifact loader: load_zero123_cc.

The reference loads weights/zero123_105000_cc.ckpt only when
embed_camera_pose=False: the legacy Δ-pose cc_projection is a single
Linear(768+4, 768) and the ckpt is applied to the whole ViewFusion with
strict=False plus `assert len(unexpected) == 0`
(viewfusion_zero_depth_rgb.py:108-121). These tests prove our loader lands
the two tensors (transposed kernel), enforces the zero-unexpected-keys
assert, and refuses the wrong config — with no model init needed (the
mapping works on any params pytree).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mvdfusion_tpu.convert.torch_to_flax import load_zero123_cc
from mvdfusion_tpu.nn.viewfusion import ViewFusionConfig

CTX = 64


def legacy_cfg() -> ViewFusionConfig:
    import dataclasses

    return dataclasses.replace(
        ViewFusionConfig(), context_dim=CTX, embed_camera_pose=False
    )


def make_params():
    """Minimal pytree shaped like the legacy-path ViewFusion around
    cc_layers_0 (Linear(ctx+4, ctx)) plus an unrelated param that must keep
    its init."""
    return {
        "params": {
            "cc_layers_0": {
                "kernel": jnp.zeros((CTX + 4, CTX), jnp.float32),
                "bias": jnp.zeros((CTX,), jnp.float32),
            },
            "time_dense1": {"kernel": jnp.full((8, 8), 7.0), "bias": jnp.zeros((8,))},
        }
    }


def save_ckpt(tmp_path, extra=False):
    rng = np.random.default_rng(3)
    sd = {
        "cc_projection.weight": torch.tensor(
            rng.normal(size=(CTX, CTX + 4)).astype(np.float32)
        ),
        "cc_projection.bias": torch.tensor(rng.normal(size=(CTX,)).astype(np.float32)),
    }
    if extra:
        sd["unet_model.stray.weight"] = torch.zeros(3)
    path = str(tmp_path / "zero123_cc.ckpt")
    # the real artifact wraps the tensors in a state_dict key
    torch.save({"state_dict": sd}, path)
    return path, {k: v.numpy() for k, v in sd.items()}


def test_cc_round_trip(tmp_path):
    path, sd = save_ckpt(tmp_path)
    params = make_params()
    out, stats = load_zero123_cc(
        params, legacy_cfg(), path, verbose=False, return_stats=True
    )
    np.testing.assert_array_equal(
        out["params"]["cc_layers_0"]["kernel"], sd["cc_projection.weight"].T
    )
    np.testing.assert_array_equal(
        out["params"]["cc_layers_0"]["bias"], sd["cc_projection.bias"]
    )
    # the unrelated param kept its init
    np.testing.assert_array_equal(
        out["params"]["time_dense1"]["kernel"], params["params"]["time_dense1"]["kernel"]
    )
    assert len(stats.wrote) == 2 and stats.unused_torch == []


def test_cc_rejects_unexpected_keys(tmp_path):
    path, _ = save_ckpt(tmp_path, extra=True)
    with pytest.raises(ValueError, match="outside"):
        load_zero123_cc(make_params(), legacy_cfg(), path, verbose=False)


def test_cc_rejects_camera_pose_config(tmp_path):
    path, _ = save_ckpt(tmp_path)
    import dataclasses

    cfg = dataclasses.replace(legacy_cfg(), embed_camera_pose=True)
    with pytest.raises(ValueError, match="embed_camera_pose"):
        load_zero123_cc(make_params(), cfg, path, verbose=False)


def test_cc_shape_guard(tmp_path):
    """A 3-layer-MLP-shaped flax tree (wrong config on disk vs in memory)
    fails loudly on shape mismatch rather than writing garbage."""
    path, _ = save_ckpt(tmp_path)
    params = {
        "params": {
            "cc_layers_0": {
                "kernel": jnp.zeros((CTX + 28, CTX), jnp.float32),
                "bias": jnp.zeros((CTX,), jnp.float32),
            }
        }
    }
    with pytest.raises(ValueError, match="shape mismatch"):
        load_zero123_cc(params, legacy_cfg(), path, verbose=False)
