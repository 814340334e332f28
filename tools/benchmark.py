#!/usr/bin/env python
"""Inference FPS benchmark (parity with reference ``tools/benchmark.py:50-82``:
200 timed iterations, 5 warmup, batch 1, device-synchronised).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS=cpu even though the axon TPU plugin would otherwise win
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vss_cffm_tpu.config import apply_overrides, load_config
from vss_cffm_tpu.models import CFFMSegmentor
from vss_cffm_tpu.utils import enable_compilation_cache


def benchmark_model(cfg, shape=(480, 864), iters=200, warmup=5, train_clip=4, batch=1):
    from vss_cffm_tpu.utils.benchmark import time_apply_chunked

    model = CFFMSegmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    h, w = shape
    imgs = jnp.asarray(np.random.RandomState(0).randn(batch, train_clip, h, w, 3),
                       jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[:1])
    dt = time_apply_chunked(lambda x: model.apply(variables, x, False), imgs,
                            iters=iters, warmup=warmup)
    return batch / dt  # clips (target frames) per second


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--shape", type=int, nargs=2, default=[480, 864])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()
    cfg = apply_overrides(load_config(args.config), args.options)
    fps = benchmark_model(cfg, tuple(args.shape), args.iters, batch=args.batch)
    print(f"fps: {fps:.2f} (clip inference at {args.shape[0]}x{args.shape[1]}, "
          f"batch {args.batch})")


if __name__ == "__main__":
    main()
