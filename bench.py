#!/usr/bin/env python
"""Headline benchmark: CFFM-B1 480×480 4-frame clip inference, frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 60 (the BASELINE.json north-star: ≥60 frames/sec/chip
on TPU v5e — each clip inference emits one refined target-frame mask, so
clips/sec == output frames/sec, matching the reference's ``tools/benchmark.py``
batch-1 fps protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
from vss_cffm_tpu.utils import enable_compilation_cache

enable_compilation_cache()

BASELINE_FPS = 60.0


def main():
    shape = (480, 480)
    iters = int(os.environ.get("BENCH_ITERS", "200"))
    warmup = 5

    model = CFFMSegmentor(build_model_config("b1"), dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 4, *shape, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)

    # Chained scan timing with tunnel-roundtrip calibration: block_until_ready
    # through remote-TPU tunnels returns before execution finishes, and each
    # host→device dispatch costs ~26 ms — both are handled by
    # time_apply_chunked (see vss_cffm_tpu/utils/benchmark.py).
    from vss_cffm_tpu.utils.benchmark import time_apply_chunked

    dt = time_apply_chunked(
        lambda x: model.apply(variables, x, False), imgs, iters=iters, warmup=warmup,
        chunk=min(50, max(iters, 1)),
    )
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "cffm_b1_480x480_clip4_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
