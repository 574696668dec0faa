"""Measure the sp (view-parallel) axis's communication cost, once, in HLO.

The sp axis shards the per-scene TARGET-VIEW axis. GridAttn attends across
ALL target views (nn/viewattn.py; reference view_attn_efficient2.py:310-316,
389-397), so GSPMD must insert cross-view collectives at its boundary every
step. This tool compiles the training step on the 8-device virtual CPU mesh
at (dp=2, sp=2, tp=2) and at the sp-free (dp=4, tp=2), parses both compiled
HLOs, and prints each mesh's collective-op census (count + bytes moved per
step by op kind) plus the sp-attributable delta. Results are recorded in
docs/ARCHITECTURE.md §6.

Run: python tools/sp_collectives.py
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
from mvdfusion_tpu.parallel.mesh import make_mesh, param_shardings
from mvdfusion_tpu.pipeline.trainer import TrainConfig, TrainState, init_train_state, make_train_step

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}
COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter", "collective-permute", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO result shape string, e.g. 'f32[2,16,16,256]{...}' or
    a tuple '(f32[...], bf16[...])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def census(hlo_text: str):
    pat = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^=]*?\)|\S+)\s+([\w\-]+)\(")
    counts = collections.Counter()
    bytes_ = collections.Counter()
    for line in hlo_text.splitlines():
        m = pat.match(line)
        if not m:
            continue
        shape, opcode = m.groups()
        for c in COLLECTIVES:
            if opcode.startswith(c):
                counts[c] += 1
                bytes_[c] += shape_bytes(shape)
    return counts, bytes_


def build_step(sp: int):
    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    tc = TrainConfig(grad_accum_step=1)
    tp = 2
    mesh = make_mesh(dp=8 // (tp * sp), tp=tp, sp=sp)
    dp = mesh.shape["dp"]

    from mvdfusion_tpu.geometry import look_at_view_transform

    rng = np.random.default_rng(0)
    S = 5
    IMG = cfg.latent_size * 4
    targets = [1, 2, 3, 4]

    def scene():
        images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
        azim = np.linspace(0.0, 360.0 * (S - 1) / S, S)
        R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90.0)
        return images, jnp.asarray(R), jnp.asarray(T), jnp.full((S, 2), 2.1875), jnp.zeros((S, 2))

    scenes = [scene() for _ in range(dp)]
    batch = {
        "images": jnp.stack([s[0] for s in scenes]),
        "R": jnp.stack([s[1] for s in scenes]),
        "T": jnp.stack([s[2] for s in scenes]),
        "f": jnp.stack([s[3] for s in scenes]),
        "c": jnp.stack([s[4] for s in scenes]),
        "input_idx": jnp.zeros((dp, 1), jnp.int32),
        "target_idx": jnp.tile(jnp.asarray([targets], jnp.int32), (dp, 1)),
    }
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0),
        batch["images"][0], batch["R"][0], batch["T"][0], batch["f"][0], batch["c"][0],
        batch["input_idx"][0], batch["target_idx"][0], jax.random.PRNGKey(1),
    )
    p_shard = param_shardings(params, mesh)
    params_s = jax.device_put(params, p_shard)
    state = init_train_state(params_s, tc)
    data_shard = {
        k: NamedSharding(mesh, P("dp", "sp") if (k == "target_idx" and sp > 1) else P("dp"))
        for k in batch
    }
    batch = {k: jax.device_put(v, data_shard[k]) for k, v in batch.items()}
    step = jax.jit(
        make_train_step(model, tc),
        in_shardings=(TrainState(params=p_shard, opt_state=None, step=None), data_shard, None),
    )
    compiled = step.lower(state, batch, jax.random.PRNGKey(7)).compile()
    return compiled.as_text(), dict(mesh.shape)


def main():
    results = {}
    for sp in (1, 2):
        hlo, shape = build_step(sp)
        counts, bytes_ = census(hlo)
        results[sp] = (counts, bytes_, shape)
        print(f"\nmesh {shape}: collectives in one compiled train step")
        total_b = 0
        for c in COLLECTIVES:
            if counts[c]:
                print(f"  {c:>20}: x{counts[c]:<4d} {bytes_[c]/1e6:8.2f} MB")
                total_b += bytes_[c]
        print(f"  {'TOTAL':>20}: {total_b/1e6:8.2f} MB/step")
    c1, b1, _ = results[1]
    c2, b2, _ = results[2]
    d_ops = sum(c2.values()) - sum(c1.values())
    d_mb = (sum(b2.values()) - sum(b1.values())) / 1e6
    print(f"\nsp-attributable delta vs (dp=4,tp=2): {d_ops:+d} collective ops, {d_mb:+.2f} MB/step")
    print("(tiny-config shapes; flagship scales bytes by the latent/channel ratio)")


if __name__ == "__main__":
    main()
