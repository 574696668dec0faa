"""Profile ONE CFG denoising step and print a device-op time breakdown.

Builds the flagship model (bench.py shapes), traces a few apply_model_cfg
steps with jax.profiler, then parses the trace_viewer JSON and aggregates
device-lane op durations by fusion/op name. This is how the README's
"profiled in-step cost" table is produced.

Run:  python tools/step_trace.py [--outdir /tmp/mvdf_trace] [--steps 4]
      python tools/step_trace.py --parse-only /tmp/mvdf_trace
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_hlo_index(outdir: str):
    """Map HLO instruction name -> (result shape, opcode/kind, module path)
    from hlo.txt. Module path comes from metadata op_name, truncated to the
    site level (e.g. unet/up_1_attn_0, viewattn, vae)."""
    import re

    path = os.path.join(outdir, "hlo.txt")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        lines = f.readlines()

    # Pass 1: find fused computations whose BODY contains a convolution. A
    # fusion whose root is a non-conv op (e.g. a fused bias-add) still owns
    # the conv's device time — the instruction line alone carries only the
    # root's metadata, so inspecting it misses these.
    comp_pat = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?.*\{\s*$")
    conv_comps = set()
    cur_comp = None
    for line in lines:
        m = comp_pat.match(line)
        if m and line.rstrip().endswith("{"):
            cur_comp = m.group(1)
            continue
        if line.strip() == "}":
            cur_comp = None
            continue
        if cur_comp is not None and (
            " convolution(" in line
            or "conv_general_dilated" in line
            or "convolution_algorithm_config" in line
        ):
            conv_comps.add(cur_comp)

    idx = {}
    pat = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)\s+([\w\-]+)\(")
    mpat = re.compile(r'op_name="[^"]*?(?:apply_model_cfg|decode_latents)/([^"]+)"')
    calls_pat = re.compile(r"calls=%?([\w.\-]+)")
    for line in lines:
        m = pat.match(line)
        if not m:
            continue
        name, shape, opcode = m.groups()
        extra = ""
        if opcode == "fusion":
            km = re.search(r"kind=(\w+)", line)
            extra = km.group(1) if km else ""
        if opcode == "custom-call":
            km = re.search(r'custom_call_target="([^"]+)"', line)
            extra = km.group(1) if km else ""
        mm = mpat.search(line)
        mod = "/".join(mm.group(1).split("/")[:2]) if mm else ""
        # a "fusion.N" can BE a convolution — detect from the instruction's
        # own metadata/backend_config OR from a conv op anywhere inside the
        # fused computation it calls
        if opcode == "fusion":
            cm = calls_pat.search(line)
            if (
                "conv_general_dilated" in line
                or "convolution_algorithm_config" in line
                or (cm and cm.group(1) in conv_comps)
            ):
                extra = (extra + "+conv") if extra else "conv"
        idx[name] = (shape, opcode, extra, mod)
    return idx


def parse_trace(outdir: str, top: int = 40):
    paths = sorted(
        glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        sys.exit(f"no trace.json.gz under {outdir}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: pids whose process name mentions TPU/device XLA ops
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_name.get((e["pid"], e.get("tid")), "")
        # XLA Ops lane holds the per-op device timeline (steps lane etc. excluded)
        if "XLA Ops" not in lane:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"device XLA-op time total: {total:.2f} ms (all traced steps)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])

    hlo_early = load_hlo_index(outdir)

    def bucket(name: str) -> str:
        # Classify by the HLO's own metadata where available: a kOutput fusion
        # named `fusion.596` can BE a convolution (metadata op_name
        # .../conv_general_dilated, emitter config in backend_config) — name
        # prefixes alone once mis-bucketed ~8 ms/step of conv time as "other"
        # and fed the round-2 "conv-ceiling" misdiagnosis.
        meta = hlo_early.get(name)
        if meta is not None:
            shape, opcode, extra, mod = meta
            if opcode == "custom-call":
                # only Mosaic kernels are "pallas"; other custom-call
                # targets (sort, topk, ...) get their own bucket
                return "pallas" if "tpu_custom_call" in extra else "custom-call"
            if "conv" in extra:
                return "conv-fusion"
        n = name.lower()
        if "conv" in n:
            return "conv-fusion"
        if any(k in n for k in ("custom-call", "tpu_custom_call")):
            return "pallas"
        if "dot" in n or "gemm" in n:
            return "matmul"
        if any(k in n for k in ("copy", "transpose", "bitcast", "reshape", "pad", "slice", "concatenate")):
            return "data-format"
        if "all-" in n or "collective" in n:
            return "collective"
        return "other"

    buck = collections.defaultdict(float)
    for name, ms in agg.items():
        buck[bucket(name)] += ms
    print("\n-- buckets --")
    for b, ms in sorted(buck.items(), key=lambda kv: -kv[1]):
        print(f"  {b:>12}: {ms:8.2f} ms  ({ms/max(total,1e-9)*100:4.1f}%)")
    hlo = hlo_early  # already loaded for the bucket pass; hlo.txt can be MBs
    if hlo:
        by_mod = collections.defaultdict(float)
        for name, ms in agg.items():
            mod = hlo.get(name, ("", "", "", "?"))[3] or "(no metadata)"
            by_mod[mod] += ms
        print("\n-- by module (ALL ops incl. tail) --")
        for mod, ms in sorted(by_mod.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {ms:8.2f} ms  {mod}")
    print(f"\n-- top {top} ops --")
    for name, ms in rows[:top]:
        shape, opcode, extra, mod = hlo.get(name, ("?", "?", "", ""))
        print(
            f"  {ms:8.3f} ms  x{cnt[name]:<4d} {name[:44]:<44} {mod[:28]:<28} "
            f"{opcode}/{extra} {shape[:48]}"
        )


def run_and_trace(outdir: str, steps: int, target: str = "step", stretch: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig

    cfg = ViewFusionConfig()
    n_views, img = 8, 256
    if stretch:
        import dataclasses

        cfg = dataclasses.replace(cfg, latent_size=64, n_pts_per_ray=3)
        img = 512
    model = ViewFusion(cfg)
    rng = np.random.default_rng(0)
    S = n_views + 1
    images = jnp.asarray(rng.uniform(size=(S, img, img, 3)), jnp.float32)
    azim = np.linspace(0.0, 360.0 * (S - 1) / S, S)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90.0)
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    ii = jnp.asarray([0])
    ti = jnp.asarray(np.arange(1, S), jnp.int32)

    t0 = time.time()
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), images, R, T, f, c, ii, ti, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(params)
    print(f"init {time.time()-t0:.1f}s", flush=True)
    # profile the same program bench.py times: bf16 tower weights
    from mvdfusion_tpu.utils.common import cast_inference_params

    params = cast_inference_params(params)
    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    _, cams, in_lat, in_cams, clip_v = prep(params, images, R, T, f, c, ii, ti)

    B = clip_v.shape[0]
    ls = cfg.latent_size

    if target == "decode":
        z = jnp.zeros((B, ls, ls, 4))

        @jax.jit
        def one_step(p, z, carry):
            z = z + carry * 0
            out = model.apply(p, z, method=ViewFusion.decode_latents)
            return jnp.sum(out.astype(jnp.float32))

        x = z
    else:
        x = jnp.zeros((B, ls, ls, 5))
        t = jnp.full((B,), 500, jnp.int32)

        @jax.jit
        def one_step(p, x, carry):
            x = x + carry * 0
            out = model.apply(
                p, x, cams, in_lat, in_cams, clip_v, t, jax.random.PRNGKey(0),
                jnp.asarray(2.5), method=ViewFusion.apply_model_cfg,
            )
            return jnp.sum(out.astype(jnp.float32))

    c0 = one_step(params, x, jnp.zeros((), jnp.float32))
    _ = float(c0)
    t0 = time.time()
    for _ in range(5):
        c0 = one_step(params, x, c0)
    _ = float(c0)
    print(f"one_step {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

    # dump the compiled HLO so parse_trace can resolve fusion names to
    # opcodes/shapes (trace op names == HLO instruction names on TPU)
    try:
        os.makedirs(outdir, exist_ok=True)
        txt = one_step.lower(params, x, c0).compile().as_text()
        with open(os.path.join(outdir, "hlo.txt"), "w") as f:
            f.write(txt)
        print(f"hlo -> {outdir}/hlo.txt ({len(txt)//1024} KiB)", flush=True)
    except Exception as e:
        print(f"hlo dump failed: {e}", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(steps):
        c0 = one_step(params, x, c0)
    _ = float(c0)
    jax.profiler.stop_trace()
    print(f"trace -> {outdir} ({steps} steps)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/mvdf_trace")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", default=None)
    ap.add_argument(
        "--target", default="step", choices=("step", "decode"),
        help="step = one CFG denoising step (default); decode = VAE decode of the 8 views",
    )
    ap.add_argument(
        "--stretch", action="store_true",
        help="trace the 512^2-class stretch shape (64^2 latents, D=3) instead",
    )
    args = ap.parse_args()
    if args.parse_only:
        parse_trace(args.parse_only, args.top)
        return
    # Persistent compile cache (same dir bench.py uses): a cold single-step
    # compile on the remote-TPU platform runs several minutes; warm re-runs
    # (knob A/Bs) deserialize in seconds.
    if not os.environ.get("MVDF_NO_COMPILE_CACHE"):
        try:
            import jax

            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception as e:  # pragma: no cover
            print(f"[step_trace] compile cache unavailable: {e}", flush=True)
    run_and_trace(args.outdir, args.steps, args.target, args.stretch)
    parse_trace(args.outdir, args.top)


if __name__ == "__main__":
    main()
