"""Evaluation / demo entry point.

Counterpart of the reference's demo.py:24-212 — but where the reference
spawns one NCCL process per GPU and hand-shards the scene list
(demo.py:63-65, 200-208), this is a single SPMD program: one process,
scenes batched over the device mesh's `dp` axis, XLA handling all
communication. On one chip it degrades to a plain scene loop.

Usage:
    python -m mvdfusion_tpu.cli.demo -c configs/gso.yaml [--eval-num N]
        [--steps 50] [--cfg-scale 2.5] [--ckpt PATH] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mvdfusion_tpu eval/demo")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--eval-num", type=int, default=None, help="number of scenes (default: config)")
    p.add_argument("--steps", type=int, default=None, help="DDIM steps (default: config/50)")
    p.add_argument("--cfg-scale", type=float, default=None)
    p.add_argument("--ckpt", default=None, help="orbax checkpoint path (default: saver.ckpt_path)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true", help="tiny model for smoke runs")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument(
        "--scene-batch",
        type=int,
        default=1,
        help="scenes per jitted SPMD step (sharded over the mesh dp axis); "
        "1 = plain sequential loop",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="multi-host SPMD: jax.distributed.initialize() makes "
        "jax.devices() span every host (the reference's -n/-nr launcher, "
        "demo.py:196-207). Artifact files are written by process 0 only; "
        "run the SAME command on every host.",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        import jax

        jax.distributed.initialize()
    import jax

    is_proc0 = jax.process_index() == 0
    import jax.numpy as jnp

    from mvdfusion_tpu.core.checkpoint import latest_checkpoint, restore_checkpoint
    from mvdfusion_tpu.core.config import build_dataset, build_model_config, load_yaml
    from mvdfusion_tpu.nn.viewfusion import ViewFusion
    from mvdfusion_tpu.pipeline.sampler import ddim_sample
    from mvdfusion_tpu.utils.vis import save_eval_artifacts

    cfg = load_yaml(args.config)
    inference = cfg.get("inference", {})
    saver = cfg.get("saver", {})
    n_targets = int(inference.get("train_batch_size", 15))
    cfg_scale = args.cfg_scale if args.cfg_scale is not None else float(inference.get("cfg_scale", 2.5))
    steps = args.steps if args.steps is not None else int(inference.get("num_ddim_steps", 50))
    eval_num = args.eval_num if args.eval_num is not None else int(inference.get("eval_num", 30))

    mcfg = build_model_config(cfg)
    if args.tiny:
        mcfg = mcfg.tiny()
    model = ViewFusion(mcfg)
    dataset = build_dataset(cfg)
    eval_num = min(eval_num, len(dataset))

    # view split: evenly spaced input + targets (random_views=false at eval,
    # viewfusion:198 linspace)
    n_views = dataset.n_views
    sel = np.linspace(0, n_views - 1, 1 + n_targets).astype(np.int64)
    input_idx = jnp.asarray(sel[:1])
    target_idx = jnp.asarray(sel[1:])

    scene0 = dataset[0]
    example = tuple(
        jnp.asarray(scene0[k]) for k in ("images", "R", "T", "f", "c")
    )
    print(f"[demo] initializing model ({'tiny' if args.tiny else 'full'})...")
    t0 = time.time()
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(args.seed), *example, input_idx, target_idx, jax.random.PRNGKey(1)
    )
    print(f"[demo] init {time.time()-t0:.1f}s")

    ckpt = args.ckpt or saver.get("ckpt_path")
    if ckpt and os.path.exists(str(ckpt)):
        path = latest_checkpoint(ckpt) if os.path.isdir(ckpt) and os.path.exists(
            os.path.join(ckpt, "latest")
        ) else ckpt
        print(f"[demo] restoring {path}")
        payload = restore_checkpoint(path, {"params": params})
        params = payload["params"]
    else:
        print("[demo] no checkpoint found — running with random weights")

    # one-time bf16 tower-weight cast (inference.bf16_weights, default on:
    # identical numerics to the bf16 compute path that would cast these
    # weights at every use, and it keeps XLA's scan from re-converting f32
    # weights each DDIM step — see bench.py / utils.common)
    if inference.get("bf16_weights", True) and jax.default_backend() == "tpu":
        from mvdfusion_tpu.utils.common import cast_inference_params

        params = cast_inference_params(params)

    save_dir = os.path.join(saver.get("exp_dir", "demo/"), inference.get("vis_dir", "vis/"))
    os.makedirs(save_dir, exist_ok=True)

    base_key = jax.random.PRNGKey(args.seed)
    unnorm = lambda d: np.clip((np.asarray(d) + 1) / 2, 0, 1)
    t_start = time.time()
    scene_metrics = []

    def report(scene, out, done):
        """Write artifacts + quality metrics for one scene's outputs
        (process 0 only under --multihost).

        Beyond PSNR/SSIM/perceptual distance vs GT, this reports the
        paper's headline property — cross-view consistency of the GENERATED
        RGB-D (reference README.md:11-12; the artifacts demo.py:85-147
        exists to show) — by reprojection at latent resolution
        (utils/metrics.cross_view_consistency): photo_mae over depth-agreeing
        reprojections, depth_agree_rate, covis_frac."""
        from mvdfusion_tpu.ops.image import area_downsample
        from mvdfusion_tpu.utils.metrics import (
            cross_view_consistency, perceptual_distance, psnr, ssim,
        )

        if not is_proc0:
            return
        jpg = save_eval_artifacts(
            save_dir, 0, int(scene["index"]),
            np.asarray(out["pred_rgb"]), np.asarray(out["gt_rgb"]),
            pred_depth=np.asarray(out["pred_depth"]),
            input_depth=np.asarray(out["input_depth"]),
            gt_depth=np.asarray(out["gt_depth"]),
        )
        p = psnr(out["pred_rgb"], out["gt_rgb"])
        s = ssim(np.asarray(out["pred_rgb"]), np.asarray(out["gt_rgb"]))
        percep = perceptual_distance(out["pred_rgb"], out["gt_rgb"])
        # consistency of generated RGB-D at latent resolution: the depth
        # channel already lives there; RGB is area-downsampled to match.
        # Absolute target cameras are equivalent to prepare_batch's relative
        # ones here (view-space z is invariant to the global rigid shift).
        pred_depth = np.asarray(out["pred_depth"])
        hw = pred_depth.shape[1]
        factor = out["pred_rgb"].shape[1] // hw
        rgb_lr = np.asarray(
            area_downsample(jnp.asarray(np.asarray(out["pred_rgb"])), factor)
        )
        tgt = np.asarray(target_idx)
        cons = cross_view_consistency(
            rgb_lr, pred_depth,
            np.asarray(scene["R"])[tgt], np.asarray(scene["T"])[tgt],
            np.asarray(scene["f"])[tgt], np.asarray(scene["c"])[tgt],
        )
        scene_metrics.append(
            dict(
                scene=str(scene["idx"]), psnr=p, ssim=s, perceptual=percep,
                photo_mae=cons["photo_mae"],
                depth_agree_rate=cons["depth_agree_rate"],
                covis_frac=cons["covis_frac"],
            )
        )
        eta = (time.time() - t_start) / done * (eval_num - done)
        print(
            f"[demo] scene {scene['idx']} -> {jpg}  psnr {p:.2f} ssim {s:.3f} "
            f"percep {percep:.3f}  cons(photo {cons['photo_mae']:.4f} "
            f"agree {cons['depth_agree_rate']:.3f} covis {cons['covis_frac']:.3f})"
            f"  [{done}/{eval_num}, eta {eta:.0f}s]"
        )

    if args.scene_batch > 1:
        # batched SPMD path: N scenes per jitted step, sharded over the dp
        # mesh axis (reference counterpart: rank-split eval, demo.py:63-65)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mvdfusion_tpu.parallel.mesh import make_mesh
        from mvdfusion_tpu.pipeline.eval import eval_scenes

        nb = args.scene_batch
        ndev = len(jax.devices())
        mesh = make_mesh(dp=ndev, tp=1) if nb % ndev == 0 else None
        done = 0
        for start in range(0, eval_num, nb):
            ids = [(start + j) % len(dataset) for j in range(nb)]
            scenes = [dataset[i] for i in ids]
            stack = {
                k: jnp.asarray(np.stack([s[k] for s in scenes]))
                for k in ("images", "R", "T", "f", "c")
            }
            keys = jnp.stack([jax.random.fold_in(base_key, i) for i in ids])
            if mesh is not None:
                shard = NamedSharding(mesh, P("dp"))
                stack = {k: jax.device_put(v, shard) for k, v in stack.items()}
                keys = jax.device_put(keys, shard)
            out = eval_scenes(
                params, model, stack["images"], stack["R"], stack["T"], stack["f"],
                stack["c"], input_idx, target_idx, keys, jnp.asarray(cfg_scale),
                num_steps=steps,
            )
            out = jax.device_get(out._asdict())
            for j, scene in enumerate(scenes):
                if start + j >= eval_num:
                    break
                done += 1
                report(scene, {k: v[j] for k, v in out.items()}, done)
    else:
        prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
        decode = jax.jit(
            lambda p, z: model.apply(p, z, method=ViewFusion.decode_latents_chunked)
        )
        for i in range(eval_num):
            scene = dataset[i]
            arrays = tuple(jnp.asarray(scene[k]) for k in ("images", "R", "T", "f", "c"))
            batch_latents, cams, in_lat, in_cams, clip_v = prep(
                params, *arrays, input_idx, target_idx
            )
            res = ddim_sample(
                params, model, cams, in_lat, in_cams, clip_v,
                jax.random.fold_in(base_key, i), jnp.asarray(cfg_scale), num_steps=steps,
                feed_prev_depth=model.cfg.feed_prev_depth,
            )
            out = {
                "pred_rgb": np.asarray(decode(params, res.latents[..., :4])),
                "gt_rgb": np.asarray(decode(params, batch_latents[..., :4])),
                "pred_depth": unnorm(res.latents[..., 4:]),
                "gt_depth": unnorm(batch_latents[..., 4:]),
                "input_depth": unnorm(in_lat[..., 4:]),
            }
            report(scene, out, i + 1)

    if scene_metrics:
        keys = ("psnr", "ssim", "perceptual", "photo_mae", "depth_agree_rate", "covis_frac")
        summary = {k: float(np.mean([m[k] for m in scene_metrics])) for k in keys}
        print(
            f"[demo] mean over {len(scene_metrics)} scenes: "
            f"psnr {summary['psnr']:.2f} ssim {summary['ssim']:.3f} "
            f"percep {summary['perceptual']:.3f} cons(photo {summary['photo_mae']:.4f} "
            f"agree {summary['depth_agree_rate']:.3f} covis {summary['covis_frac']:.3f})"
        )
        import json

        with open(os.path.join(save_dir, "metrics.json"), "w") as fp:
            json.dump({"scenes": scene_metrics, "summary": summary}, fp, indent=2)
        print(f"[demo] metrics -> {os.path.join(save_dir, 'metrics.json')}")


if __name__ == "__main__":
    main()
