#!/usr/bin/env python
"""Per-stage microbench: whole-block megakernel vs composed MiT block.

The round-3 verdict's #1 item: the block megakernel (`ops/stage_block.py`)
measured 177-218 fps end-to-end vs 253 fps composed, but no per-stage
isolation existed to locate the loss. This tool times ONE MiTBlock at each
real CFFM-B1 480² stage geometry (4 frames) under both implementations —
same params, tunnel-calibrated chained-scan timing — and optionally a matrix
of end-to-end forward configurations.

Usage::

    python tools/bench_stage_block.py              # per-stage isolation
    python tools/bench_stage_block.py --e2e        # end-to-end config matrix
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vss_cffm_tpu.utils import enable_compilation_cache
from vss_cffm_tpu.utils.benchmark import time_apply_chunked

# CFFM-B1 @ 480²: (H, W, C, heads, sr, mlp_ratio, depth)
STAGES = {
    1: (120, 120, 64, 1, 8, 4, 2),
    2: (60, 60, 128, 2, 4, 4, 2),
    3: (30, 30, 320, 5, 2, 4, 2),
    4: (15, 15, 512, 8, 1, 4, 2),
}


def bench_stages(iters: int, frames: int):
    from vss_cffm_tpu.models.mit import MiTBlock

    print(f"{'stage':>5} {'geometry':>22} {'composed us':>12} {'fused us':>10} "
          f"{'ratio':>6}")
    for s, (h, w, c, nh, sr, mr, _) in STAGES.items():
        x = jnp.asarray(np.random.RandomState(s).randn(frames, h, w, c),
                        jnp.float32).astype(jnp.bfloat16)
        mk = lambda impl: MiTBlock(
            dim=c, num_heads=nh, sr_ratio=sr, mlp_ratio=mr, qkv_bias=True,
            drop=0.0, attn_drop=0.0, drop_path_rate=0.0, norm_eps=1e-6,
            block_impl=impl, dtype=jnp.bfloat16)
        variables = jax.jit(mk(None).init)(jax.random.PRNGKey(s), x)
        res = {}
        for impl in (None, "fused"):
            m = mk(impl)
            dt = time_apply_chunked(lambda a, m=m: m.apply(variables, a), x,
                                    iters=iters, chunk=min(iters, 200))
            res[impl or "composed"] = dt * 1e6
        ratio = res["fused"] / res["composed"]
        print(f"{s:>5} ({frames},{h},{w},{c}) nh={nh} sr={sr}"
              f" {res['composed']:>10.1f} {res['fused']:>10.1f} {ratio:>6.2f}")


E2E_CONFIGS = [
    # (label, block_impl, embed_impl)
    ("composed (default)", None, None),
    ("fused all stages", "fused", None),
    ("fused all + im2col s1", "fused", ("im2col", None, None, None)),
    ("fused s1 only + im2col s1", ("fused", None, None, None),
     ("im2col", None, None, None)),
    ("fused s1+s2 + im2col s1", ("fused", "fused", None, None),
     ("im2col", None, None, None)),
    ("fused s2-s4", (None, "fused", "fused", "fused"), None),
    ("fused s2+s3", (None, "fused", "fused", None), None),
    ("fused all + im2col all", "fused", "im2col"),
    ("fused s1-s3 + im2col all", ("fused", "fused", "fused", None), "im2col"),
    ("fused s1-s3 + im2col s1", ("fused", "fused", "fused", None),
     ("im2col", None, None, None)),
    ("fused s2-s4 + im2col s1", (None, "fused", "fused", "fused"),
     ("im2col", None, None, None)),
    ("fused s2+s3 both-composed-ends + im2col s1",
     (None, "fused", "fused", None), ("im2col", None, None, None)),
    ("fused s2-s4 + im2col s1+s2", (None, "fused", "fused", "fused"),
     ("im2col", "im2col", None, None)),
]


def bench_e2e(iters: int, only: str | None = None, variant: str = "b1",
              shape: tuple[int, int] = (480, 480), grouped_kv: bool = False):
    import dataclasses

    from vss_cffm_tpu.models import CFFMSegmentor, build_model_config

    h, w = shape
    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 4, h, w, 3),
                       jnp.float32)
    base = build_model_config(variant)
    if grouped_kv:
        head = dataclasses.replace(
            base.head,
            decoder=dataclasses.replace(base.head.decoder,
                                        infer_kv_layout="grouped"))
        base = dataclasses.replace(base, head=head)
    configs = [("shipped default", base.block_impl, base.embed_impl)] + E2E_CONFIGS
    variables = None
    for label, bi, ei in configs:
        if only and only not in label:
            continue
        cfg = dataclasses.replace(base, block_impl=bi, embed_impl=ei)
        model = CFFMSegmentor(cfg, dtype=jnp.bfloat16)
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        dt = time_apply_chunked(lambda x, m=model: m.apply(variables, x, False),
                                imgs, iters=iters, chunk=min(iters, 50))
        print(f"{label:<32} {dt * 1e3:8.3f} ms  {1 / dt:7.1f} fps")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--only", default=None, help="substring filter for --e2e")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--variant", default="b1")
    ap.add_argument("--shape", type=int, nargs=2, default=(480, 480))
    ap.add_argument("--grouped-kv", action="store_true",
                    help="probe: grouped (train-layout) K/V refs for the "
                         "CFM inference kernel instead of the packed concat")
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    if args.e2e:
        bench_e2e(args.iters, args.only, args.variant, tuple(args.shape),
                  args.grouped_kv)
    else:
        bench_stages(args.iters, args.frames)
