"""Training entry point.

Counterpart of the reference's train.py:27-214. Differences by design:
  * single SPMD process over the device mesh (no mp.spawn/NCCL rendezvous,
    train.py:202-210) — scenes batch over `dp`, big kernels shard over `tp`;
  * gradient accumulation implemented honestly via optax.MultiSteps (the
    reference config key grad_accum_step is dead, SURVEY.md §2.5);
  * orbax checkpoints {params, opt_state, step, epoch} with a `latest`
    pointer (train.py:166-181) and stateful resume that skips consumed
    batches within the epoch (utils/data_sampler_utils.py semantics).

Usage:
    python -m mvdfusion_tpu.cli.train -c configs/train.yaml [--tiny]
        [--dp N --tp M] [--max-steps N]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mvdfusion_tpu training")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--dp", type=int, default=None, help="data-parallel width (default: all devices)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel width")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument(
        "--scenes-per-chip", type=int, default=None,
        help="scenes per dp shard per step (overrides trainer.scenes_per_chip; "
        "configs/train.yaml ships 4 — the measured-best single-chip batch, "
        "TRAIN_BENCH.json — so pass 1 for the reference recipe's exact "
        "1 scene/GPU/step, train.py:87, e.g. when resuming a pre-round-5 "
        "run whose lr was tuned at that batch)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument(
        "--profile", default=None, help="write a jax.profiler trace of steps 10-13 to this dir"
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="multi-host SPMD: call jax.distributed.initialize() so jax.devices() "
        "spans every host's chips and the mesh is global (the reference's "
        "-n/-nr node launcher, demo.py:196-207, with zero rendezvous code — "
        "TPU coordinator discovery is automatic). Checkpoints and printed "
        "logs are owned by process 0; every process must run THIS same "
        "command (one process per host).",
    )
    return p.parse_args(argv)


def _maybe_init_multihost(args) -> bool:
    """jax.distributed.initialize() before any backend touch. Returns True
    if this process should write checkpoints/artifacts (process 0)."""
    if args.multihost:
        import jax

        jax.distributed.initialize()  # env-based coordinator discovery on TPU
    import jax

    return jax.process_index() == 0


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    is_proc0 = _maybe_init_multihost(args)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvdfusion_tpu.core.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from mvdfusion_tpu.core.config import build_dataset, build_model_config, build_train_config, load_yaml
    from mvdfusion_tpu.data.sampler import StatefulShardedSampler
    from mvdfusion_tpu.nn.viewfusion import ViewFusion
    from mvdfusion_tpu.parallel.mesh import data_sharding, make_mesh, param_shardings
    from mvdfusion_tpu.pipeline.trainer import TrainState, init_train_state, make_train_step
    from mvdfusion_tpu.utils.metrics import AverageMeter

    cfg = load_yaml(args.config)
    trainer_cfg = cfg.get("trainer", {})
    saver = cfg.get("saver", {})
    epochs = int(trainer_cfg.get("epochs", 200))
    n_targets = int(trainer_cfg.get("train_batch_size", 5))
    random_views = bool(trainer_cfg.get("random_views", True))

    mcfg = build_model_config(cfg)
    if args.tiny:
        mcfg = mcfg.tiny()
    tc = build_train_config(cfg)
    model = ViewFusion(mcfg)
    dataset = build_dataset(cfg)

    tp = args.tp
    dp = args.dp or (len(jax.devices()) // tp)
    mesh = make_mesh(dp=dp, tp=tp)
    spc = args.scenes_per_chip or int(trainer_cfg.get("scenes_per_chip", 1))
    print(
        f"[train] mesh dp={dp} tp={tp} over {len(jax.devices())} devices, "
        f"{spc} scene(s)/chip/step"
    )

    n_views = dataset[0]["images"].shape[0]
    rng_np = np.random.default_rng(args.seed)

    def view_split(rng_np):
        if random_views:
            perm = rng_np.permutation(n_views)
        else:
            perm = np.linspace(0, n_views - 1, 1 + n_targets).astype(np.int64)
        return perm[:1].astype(np.int64), perm[1 : 1 + n_targets].astype(np.int64)

    # ----- init params + state -------------------------------------------
    scene0 = dataset[0]
    ii, ti = view_split(rng_np)
    example = tuple(jnp.asarray(scene0[k]) for k in ("images", "R", "T", "f", "c"))
    t0 = time.time()
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(args.seed), *example, jnp.asarray(ii), jnp.asarray(ti), jax.random.PRNGKey(1)
    )
    print(f"[train] init {time.time()-t0:.1f}s")
    p_shard = param_shardings(params, mesh)
    params = jax.device_put(params, p_shard)
    state = init_train_state(params, tc)

    ckpt_dir = os.path.join(saver.get("exp_dir", "runs/"), "ckpt")
    start_step, start_epoch = 0, 0
    latest = latest_checkpoint(ckpt_dir)
    if latest:
        print(f"[train] resuming from {latest}")
        template = {"params": state.params, "opt_state": state.opt_state, "step": 0, "epoch": 0}
        if state.ema is not None:
            template["ema"] = state.ema
        payload = restore_checkpoint(latest, template)
        # re-place restored leaves on the mesh shardings of the live state —
        # restored arrays land on the default device, and one jit cannot mix
        # single-device and mesh-sharded arguments
        replicated = NamedSharding(mesh, P())

        def _placement(ref_leaf):
            s = getattr(ref_leaf, "sharding", None)
            return s if isinstance(s, NamedSharding) else replicated

        ref_flat, treedef = jax.tree.flatten(state.opt_state)
        new_flat = jax.tree.leaves(payload["opt_state"])
        opt_state = jax.tree.unflatten(
            treedef, [jax.device_put(n, _placement(r)) for n, r in zip(new_flat, ref_flat)]
        )
        state = TrainState(
            params=jax.device_put(payload["params"], p_shard),
            opt_state=opt_state,
            step=jax.device_put(jnp.asarray(payload["step"], jnp.int32), NamedSharding(mesh, P())),
            ema=(
                jax.device_put(payload["ema"], p_shard)
                if state.ema is not None and "ema" in payload
                else state.ema
            ),
        )
        start_step, start_epoch = int(payload["step"]), int(payload["epoch"])

    data_shard = data_sharding(mesh)
    train_step = jax.jit(
        make_train_step(model, tc),
        in_shardings=(
            TrainState(
                params=p_shard,
                opt_state=None,
                step=None,
                ema=p_shard if state.ema is not None else None,
            ),
            None,
            None,
        ),
        donate_argnums=(0,),
    )

    sampler = StatefulShardedSampler(
        len(dataset), batch_size=dp * spc, seed=args.seed, start_step=start_step
    )

    load_keys = ("images", "R", "T", "f", "c") + (("depths",) if "depths" in scene0 else ())

    def make_batch(scene_ids):
        scenes = [dataset[int(s)] for s in scene_ids]
        batch = {k: jnp.asarray(np.stack([s[k] for s in scenes])) for k in load_keys}
        iis, tis = [], []
        for _ in scenes:
            a, b = view_split(rng_np)
            iis.append(a)
            tis.append(b)
        batch["input_idx"] = jnp.asarray(np.stack(iis))
        batch["target_idx"] = jnp.asarray(np.stack(tis))
        return {k: jax.device_put(v, data_shard) for k, v in batch.items()}

    meter = AverageMeter(length=100)
    rng = jax.random.PRNGKey(args.seed + 1)
    print_interval = int(saver.get("print_interval", 100))
    save_interval = int(saver.get("save_interval", 2000))
    vis_interval = int(saver.get("vis_interval", 0))  # 0 = off
    vis_ddim_steps = int(saver.get("vis_ddim_steps", 50))
    vis_dir = os.path.join(saver.get("exp_dir", "runs/"), saver.get("vis_dir", "vis/"))
    loss_interval = int(saver.get("loss_interval", print_interval))
    loss_dir = os.path.join(saver.get("exp_dir", "runs/"), saver.get("loss_dir", "loss/"))

    regression = bool(saver.get("regression", False))

    def visualize(params, batch, step):
        """Periodic training-time DDIM sample grid (reference train.py:116-117
        + utils/vis_utils.py:21-93): full sample at cfg 1.0 on the first
        scene of the current batch, rows [noise|pred|gt|pred_d|gt_d].
        saver.regression=true replaces the full DDIM sample with the
        reference's cheap 1-step preview (vis_utils.py:29-36: apply_model on
        the clean latents at t=999, then predict_start_from_noise)."""
        from mvdfusion_tpu.pipeline.sampler import ddim_sample
        from mvdfusion_tpu.utils.vis import save_train_vis_grid

        one = {k: batch[k][0] for k in batch}
        lat, cams, in_lat, in_cams, clip_v = jax.jit(
            lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch)
        )(params, one["images"], one["R"], one["T"], one["f"], one["c"],
          one["input_idx"], one["target_idx"])
        if regression:
            from mvdfusion_tpu.core.schedule import (
                make_ddpm_schedule, predict_start_from_noise,
            )

            sched = make_ddpm_schedule(
                mcfg.timesteps, mcfg.linear_start, mcfg.linear_end
            )

            @jax.jit
            def one_step_preview(p, lat, clip_v):
                t = jnp.full((lat.shape[0],), mcfg.timesteps - 1, jnp.int32)
                eps = model.apply(
                    p, lat, cams, in_lat, in_cams, clip_v, t,
                    jax.random.PRNGKey(step), method=ViewFusion.apply_model,
                )
                return predict_start_from_noise(sched, lat, eps, t)

            from mvdfusion_tpu.pipeline.sampler import SampleResult

            res = SampleResult(
                latents=one_step_preview(params, lat, clip_v),
                pred_x0_trajectory=jnp.zeros(()),
            )
        else:
            res = ddim_sample(
                params, model, cams, in_lat, in_cams, clip_v,
                jax.random.PRNGKey(step), jnp.asarray(1.0), num_steps=vis_ddim_steps,
            )
        decode = jax.jit(lambda p, z: model.apply(p, z, method=ViewFusion.decode_latents))
        noise = jax.random.normal(jax.random.PRNGKey(step + 1), lat[..., :4].shape)
        # overwrite_x_noisy semantics (vis_utils.py:49-51): slot 0 shows gt
        noise = noise.at[0].set(lat[0, ..., :4])
        unnorm = lambda d: np.clip((np.asarray(d) + 1) / 2, 0, 1)
        save_train_vis_grid(
            os.path.join(vis_dir, f"{step:07d}.jpg"),
            np.asarray(decode(params, noise)),
            np.asarray(decode(params, res.latents[..., :4])),
            np.asarray(decode(params, lat[..., :4])),
            unnorm(res.latents[..., 4:]),
            unnorm(lat[..., 4:]),
            input_rgb=np.asarray(decode(params, in_lat[..., :4])),
            input_depth=unnorm(in_lat[..., 4:]),
            concat_input=bool(saver.get("concat_input", False)),
        )
        print(f"[train] wrote visual sample grid @ step {step}")
    loss_history = []
    step = start_step
    t_last = time.time()
    from mvdfusion_tpu.data.prefetch import PrefetchIterator

    for epoch in range(start_epoch, epochs):
        # background host decode overlaps device steps (prefetch.py)
        for batch in PrefetchIterator(sampler.epoch(epoch), make_batch, depth=2):
            rng, krun = jax.random.split(rng)
            if args.profile and step - start_step == 10:
                jax.profiler.start_trace(args.profile)
            state, loss = train_step(state, batch, krun)
            step += 1
            if args.profile and step - start_step == 13:
                jax.profiler.stop_trace()
                print(f"[train] profiler trace written to {args.profile}")
            meter.update(float(loss))
            if step % loss_interval == 0 and is_proc0:
                loss_history.append(meter.avg)
                from mvdfusion_tpu.utils.vis import save_loss_plot

                save_loss_plot(os.path.join(loss_dir, "loss.png"), loss_history, loss_interval)
            if step % print_interval == 0 and is_proc0:
                dt = (time.time() - t_last) / print_interval
                t_last = time.time()
                print(f"[train] epoch {epoch} step {step} loss {meter.avg:.4f} ({dt:.2f}s/it)")
            if vis_interval and step % vis_interval == 0 and is_proc0:
                from mvdfusion_tpu.pipeline.trainer import eval_params

                visualize(eval_params(state), batch, step)
            # checkpoint/artifact ownership: process 0 only (the reference's
            # rank-0 gating, train.py:99-129). device_get of sharded params
            # all-gathers to host; fine at this model size on every host, but
            # only one may WRITE the orbax dir.
            if step % save_interval == 0 and is_proc0:
                payload = {
                    "params": jax.device_get(state.params),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": step,
                    "epoch": epoch,
                }
                if state.ema is not None:
                    payload["ema"] = jax.device_get(state.ema)
                save_checkpoint(ckpt_dir, step, payload)
                print(f"[train] saved checkpoint @ step {step}")
            if args.max_steps and step - start_step >= args.max_steps:
                print("[train] reached max steps")
                return
        sampler.reset_offset()


if __name__ == "__main__":
    main()
