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

BASELINE_FPS = 60.0


def main():
    shape = (480, 480)
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    warmup = 5

    model = CFFMSegmentor(build_model_config("b1"), dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 4, *shape, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)

    # Chain `chunk` forwards inside one jit (scan) with a data dependency
    # between iterations and a scalar readback at the end: block_until_ready
    # through remote-TPU tunnels can return before execution finishes, so
    # per-call host timing under-reports. The scalar fetch forces completion.
    chunk = 10

    @jax.jit
    def forward_chunk(v, x):
        def body(carry, _):
            out = model.apply(v, carry, False)
            # fold the output back into the input so iterations can't be
            # collapsed/elided by the compiler (1e-20 keeps numerics intact)
            nxt = carry + jnp.mean(out).astype(carry.dtype) * 1e-20
            return nxt, ()
        final, _ = jax.lax.scan(body, x, None, length=chunk)
        return jnp.sum(final[0, 0, 0, 0])

    float(forward_chunk(variables, imgs))  # compile + warm
    for _ in range(warmup):
        float(forward_chunk(variables, imgs))
    n_chunks = max(iters // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        float(forward_chunk(variables, imgs))
    dt = (time.perf_counter() - t0) / (n_chunks * chunk)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "cffm_b1_480x480_clip4_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
