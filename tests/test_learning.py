"""Learning proof (slow): the full pipeline trains in the right direction.

Uses tools/overfit_synthetic.py's stages at smoke scale on CPU: VAE
reconstruction improves to a usable PSNR, the diffusion loss falls
substantially under the real trainer, and a short-DDIM sample of a
held-out pose lands measurably closer to ground truth than the
random-weight floor. The committed full-scale result (thousands of steps
on the TPU chip, recognizable re-renders) lives in docs/LEARNING.md +
artifacts/overfit; this test keeps the property under CI at CPU scale.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow


def test_overfit_learns(tmp_path):
    from overfit_synthetic import (
        OverfitArgs,
        build_dataset,
        build_model,
        evaluate,
        init_params,
        pretrain_vae,
        train_diffusion,
    )

    args = OverfitArgs(
        scenes=2,
        vae_steps=120,
        steps=260,
        eval_ddim_steps=8,
        lr=1e-3,
        vae_lr=3e-3,
        seed=0,
        out=str(tmp_path),
        log_every=50,
        # the mixed primitive family (boxes/cylinders/spheres with an
        # occlusion-contact pair) — the full-scale committed proof trains
        # on this family too (docs/LEARNING.md, VERDICT r4 #6)
        family="mixed",
        textured=True,
    )
    ds, batch = build_dataset(args)
    model, cfg = build_model(args)
    params = init_params(model, batch, args.seed)

    params, vae_psnr = pretrain_vae(model, params, batch, args)
    # random-init VAE reconstructions are noise (~8 dB); after a couple
    # hundred steps it must at least be reconstructing coarse structure
    assert vae_psnr > 14.0, f"VAE failed to learn: {vae_psnr:.2f} dB"

    _, floor = evaluate(model, params, ds, batch, args, eval_views=[3, 11], tag="floor")
    floor_psnr = float(np.mean([p for r in floor for p in r["psnr"]]))
    floor_dmae = float(np.mean([r["depth_mae"] for r in floor]))

    params, losses = train_diffusion(model, params, batch, args)
    first, last = float(np.mean(losses[:40])), float(np.mean(losses[-40:]))
    # the noise-prediction loss must fall decisively, not wander
    assert last < 0.62 * first, f"no loss progress: {first:.4f} -> {last:.4f}"

    _, trained = evaluate(model, params, ds, batch, args, eval_views=[3, 11], tag="trained")
    trained_psnr = float(np.mean([p for r in trained for p in r["psnr"]]))
    trained_dmae = float(np.mean([r["depth_mae"] for r in trained]))

    # held-out-pose sampling must beat the random-diffusion floor on RGB
    # PSNR; margins are modest because this is a few-hundred-step smoke run
    assert trained_psnr > floor_psnr + 1.5, (
        f"novel-view PSNR did not improve: floor {floor_psnr:.2f} -> {trained_psnr:.2f}"
    )
    # depth channel must also move toward the ground truth
    assert trained_dmae < floor_dmae, (
        f"depth MAE did not improve: {floor_dmae:.4f} -> {trained_dmae:.4f}"
    )
