"""TrainConfig stabilizers exposed for the learning proof (VERDICT r2 #6):
cosine lr schedule and parameter EMA, both reachable from the YAML trainer
section (core/config.build_train_config) and OFF by default — the defaults
are the exact reference recipe (flat lr, no EMA, train.py:95)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvdfusion_tpu.core.config import build_train_config
from mvdfusion_tpu.pipeline.trainer import (
    TrainConfig,
    TrainState,
    eval_params,
    init_train_state,
    learning_rate,
)


def test_learning_rate_constant_default():
    assert learning_rate(TrainConfig(lr=3e-4)) == 3e-4


def test_learning_rate_cosine_matches_optax_closed_form():
    import optax

    tc = TrainConfig(lr=1e-3, lr_schedule="cosine", lr_decay_steps=100, lr_alpha=0.1)
    sched = learning_rate(tc)
    ref = optax.cosine_decay_schedule(1e-3, 100, alpha=0.1)
    for t in (0, 1, 50, 99, 100, 500):
        np.testing.assert_allclose(float(sched(t)), float(ref(t)), rtol=1e-6)
    # decays to the alpha floor, not zero
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)


def test_learning_rate_validation():
    with pytest.raises(ValueError, match="lr_decay_steps"):
        learning_rate(TrainConfig(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        learning_rate(TrainConfig(lr_schedule="linear"))


def test_learning_rate_callable_passthrough():
    f = lambda t: 7.0
    assert learning_rate(TrainConfig(lr=f)) is f


def _tiny_params():
    return {"params": {"view_attn": {"w": jnp.ones((2, 2))}}}


def test_ema_off_by_default():
    state = init_train_state(_tiny_params(), TrainConfig())
    assert state.ema is None
    # eval_params falls back to the live params
    assert eval_params(state) is state.params


def test_ema_init_copies_not_aliases():
    params = _tiny_params()
    state = init_train_state(params, TrainConfig(ema_decay=0.999))
    assert state.ema is not None
    w = state.ema["params"]["view_attn"]["w"]
    np.testing.assert_array_equal(np.asarray(w), np.ones((2, 2)))
    # a fresh buffer (donation of params must not invalidate the ema)
    assert w is not params["params"]["view_attn"]["w"]
    assert eval_params(state) is state.ema


def test_ema_warmup_decay_semantics():
    """One full train step at step=0: warmup decay is min(0.999, 1/10), so
    ema = 0.1*init + 0.9*new_params — tracks the live params early instead
    of the random init."""
    from mvdfusion_tpu.data.synthetic import SyntheticScenes
    from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
    from mvdfusion_tpu.pipeline.trainer import make_train_step

    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    ds = SyntheticScenes(n_scenes=1, image_size=cfg.latent_size * 4, seed=0)
    s = ds[0]
    args = (
        jnp.asarray(s["images"]), jnp.asarray(s["R"]), jnp.asarray(s["T"]),
        jnp.asarray(s["f"]), jnp.asarray(s["c"]),
        jnp.asarray([0]), jnp.asarray([1, 2]),
    )
    params = model.init(
        jax.random.PRNGKey(0), *args, jax.random.PRNGKey(1), method=ViewFusion.init_all
    )
    tc = TrainConfig(lr=1e-2, finetune_unet=True, ema_decay=0.999)
    state = init_train_state(params, tc)
    batch = {
        k: v[None] for k, v in zip(
            ("images", "R", "T", "f", "c", "input_idx", "target_idx"), args
        )
    }
    new_state, loss = jax.jit(make_train_step(model, tc))(
        state, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    k = ("params", "unet", "mid_attn", "proj_in", "kernel")

    def leaf(tree):
        x = tree
        for kk in k:
            x = x[kk]
        return np.asarray(x)

    expected = 0.1 * leaf(params) + 0.9 * leaf(new_state.params)
    np.testing.assert_allclose(leaf(new_state.ema), expected, rtol=1e-5, atol=1e-7)
    # step=0 with no EMA requested stays None through the step
    tc0 = TrainConfig(lr=1e-2)
    st0 = init_train_state(params, tc0)
    st1, _ = jax.jit(make_train_step(model, tc0))(st0, batch, jax.random.PRNGKey(2))
    assert st1.ema is None


def test_build_train_config_reads_stabilizer_keys():
    cfg = {
        "model": {"params": {}},
        "trainer": {
            "lr": 3e-4, "lr_schedule": "cosine", "lr_decay_steps": 8000,
            "lr_alpha": 0.2, "ema_decay": 0.999, "grad_clip": 1.0,
            "skip_nonfinite": True,
        },
    }
    tc = build_train_config(cfg)
    assert tc.lr_schedule == "cosine" and tc.lr_decay_steps == 8000
    assert tc.lr_alpha == 0.2 and tc.ema_decay == 0.999
    assert tc.grad_clip == 1.0 and tc.skip_nonfinite is True
    # defaults = reference recipe
    tc0 = build_train_config({"model": {"params": {}}, "trainer": {}})
    assert tc0.lr_schedule == "constant" and tc0.ema_decay == 0.0
    assert tc0.grad_clip == 0.0 and tc0.skip_nonfinite is False
