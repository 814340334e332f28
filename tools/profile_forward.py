#!/usr/bin/env python
"""Per-op device-time profile of the CFFM clip-inference forward.

Captures a ``jax.profiler`` trace of N chained forwards on the attached
device, parses the xplane proto directly (tensorboard-plugin-profile's
schema) and prints device time aggregated by HLO op name prefix — the tool
behind DEVELOPMENT.md's "backbone emitter analysis" numbers.

Usage:
    python tools/profile_forward.py                       # default config
    python tools/profile_forward.py --block-impl fused    # megakernel path
    python tools/profile_forward.py --block-impl ,fused,fused,fused \
        --embed-impl im2col --top 40
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _parse_impl(s: str | None):
    if not s:
        return None
    if "," in s:
        return tuple((t or None) for t in s.split(","))
    return s


def aggregate_xspace(trace_dir: str) -> dict[str, float]:
    """Sum device-plane event durations (µs) by event name.

    Exactly ONE op line per device plane is aggregated ("XLA Ops" preferred)
    so a plane carrying several matching lines can't double-count device time.
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # plugin layout varies by version
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    agg: dict[str, float] = collections.defaultdict(float)
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            nm = plane.name.lower()
            if "tpu" not in nm and "device" not in nm and "axon" not in nm:
                continue
            if "host" in nm:
                continue
            # Pick the single best op line: "XLA Ops" if present, else the
            # first line that looks op-shaped.
            candidates = [
                ln for ln in plane.lines
                if "xla op" in ln.name.lower() or "xla:" in ln.name.lower()
                or ln.name.lower() == "ops"
            ]
            if not candidates:
                continue
            preferred = [ln for ln in candidates if ln.name.lower() == "xla ops"]
            line = preferred[0] if preferred else candidates[0]
            ev_meta = plane.event_metadata
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e6
    return dict(agg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="b1")
    ap.add_argument("--shape", type=int, nargs=2, default=(480, 480))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--block-impl", default=None)
    ap.add_argument("--embed-impl", default=None)
    ap.add_argument("--dwconv-impl", default=None)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--train", action="store_true",
                    help="profile the jitted train step (B=8 480² reference "
                         "geometry) instead of clip inference")
    ap.add_argument("--train-block-impl", default=None,
                    help="train_block_impl override (e.g. 'ffn' or "
                         "'ffn,ffn,ffn,' per stage)")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
    from vss_cffm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_model_config(args.variant)
    # Absent flags keep the config defaults; "none" forces the composed
    # path / conv embeds explicitly.
    overrides = {}
    for field, raw in (("block_impl", args.block_impl),
                       ("embed_impl", args.embed_impl),
                       ("dwconv_impl", args.dwconv_impl)):
        if raw is not None:
            overrides[field] = None if raw == "none" else _parse_impl(raw)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    model = CFFMSegmentor(cfg, dtype=jnp.bfloat16)
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="vss_prof_")
    if args.train:
        # Profile the jitted train step at the reference B=8 480² geometry.
        from vss_cffm_tpu.config import load_config
        from vss_cffm_tpu.train import (TrainState, build_optimizer,
                                        make_train_step)

        tcfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                        "configs",
                                        f"cffm_{args.variant}_vspw_160k.py"))
        model_overrides = dict(overrides)
        if args.train_block_impl is not None:
            model_overrides["train_block_impl"] = _parse_impl(
                args.train_block_impl)
        if model_overrides:
            tcfg = dataclasses.replace(
                tcfg, model=dataclasses.replace(tcfg.model, **model_overrides))
        b = args.batch or tcfg.data.batch_size
        h, w = tcfg.data.crop_size
        rng = np.random.RandomState(0)
        batch = {
            "imgs": jnp.asarray(rng.randn(b, 4, h, w, 3), jnp.float32),
            "labels": jnp.asarray(
                rng.randint(0, tcfg.model.head.num_classes, (b, 4, h, w)),
                jnp.int32),
        }
        tmodel = CFFMSegmentor(tcfg.model, dtype=jnp.bfloat16)
        variables = jax.jit(tmodel.init)(jax.random.PRNGKey(0),
                                         batch["imgs"][:1])
        tx = build_optimizer(variables["params"], tcfg.optim)
        state = TrainState.create(variables, tx)
        step = make_train_step(tmodel, tx)
        key = jax.random.PRNGKey(1)
        state, m = step(state, batch, key)  # compile outside the trace
        float(m["loss_seg"])
        with jax.profiler.trace(trace_dir):
            for i in range(args.iters):
                state, m = step(state, batch, jax.random.fold_in(key, i))
            float(m["loss_seg"])
    else:
        imgs = jnp.asarray(np.random.RandomState(0).randn(1, 4, *args.shape, 3),
                           jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        fwd = jax.jit(lambda x: model.apply(variables, x, False))
        fwd(imgs).block_until_ready()  # compile outside the trace

        with jax.profiler.trace(trace_dir):
            y2 = imgs
            for _ in range(args.iters):
                y2 = fwd(imgs)
            y2.block_until_ready()
    agg = aggregate_xspace(trace_dir)
    total = sum(agg.values())
    per_iter = total / max(args.iters, 1)
    print(f"trace: {trace_dir}")
    print(f"device total: {total:.1f} us over {args.iters} iters "
          f"= {per_iter:.1f} us/iter ({1e6 / per_iter if per_iter else 0:.1f} fps)")
    print(f"{'us/iter':>10}  {'%':>5}  op")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{us / args.iters:>10.1f}  {100 * us / total:>5.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
