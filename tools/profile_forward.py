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
    args = ap.parse_args()

    from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
    from vss_cffm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_model_config(args.variant)
    cfg = dataclasses.replace(
        cfg,
        block_impl=_parse_impl(args.block_impl),
        embed_impl=_parse_impl(args.embed_impl),
        dwconv_impl=args.dwconv_impl,
    )
    model = CFFMSegmentor(cfg, dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 4, *args.shape, 3),
                       jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
    fwd = jax.jit(lambda x: model.apply(variables, x, False))
    fwd(imgs).block_until_ready()  # compile outside the trace

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="vss_prof_")
    with jax.profiler.trace(trace_dir):
        y = imgs
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
