#!/usr/bin/env python
"""One-shot on-device validation: forward, variants, train step, streaming.

Runs the whole device-facing surface on the attached TPU (or CPU) and prints
a summary — the quick health check for a new environment or after
perf-sensitive changes. Synthetic data only; ~5 min including compiles.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
from vss_cffm_tpu.train import OptimConfig, TrainState, build_optimizer, make_train_step
from vss_cffm_tpu.utils.benchmark import time_apply_chunked


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    results = {}

    # clip inference fps per variant
    imgs = jnp.asarray(rng.randn(1, 4, 480, 480, 3), jnp.float32)
    for variant in ("b0", "b1"):
        model = CFFMSegmentor(build_model_config(variant), dtype=jnp.bfloat16)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        dt = time_apply_chunked(lambda x: model.apply(v, x, False), imgs,
                                iters=30, chunk=15)
        results[f"cffm_{variant}_fps"] = round(1 / dt, 1)

    # streaming steady-state (B1)
    model = CFFMSegmentor(build_model_config("b1"), dtype=jnp.bfloat16)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
    frame = jnp.asarray(rng.randn(1, 480, 480, 3), jnp.float32)
    dt1 = time_apply_chunked(lambda x: model.apply(v, x, method=model.frame_features),
                             frame, iters=30, chunk=15)
    fused = jnp.asarray(rng.randn(1, 4, 120, 120, 256), jnp.bfloat16)
    dt2 = time_apply_chunked(
        lambda f: model.apply(v, f, None, method=model.predict_from_features),
        fused, iters=30, chunk=15)
    results["streaming_video_fps"] = round(1 / (dt1 + dt2), 1)

    # train step at reference global batch
    batch = {
        "imgs": jnp.asarray(rng.randn(8, 4, 480, 480, 3), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 124, (8, 4, 480, 480)), jnp.int32),
    }
    tx = build_optimizer(v["params"], OptimConfig())
    state = TrainState.create(v, tx)
    step = make_train_step(model, tx)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    l0 = float(m["loss_seg"])
    t0 = time.time()
    n = 10
    for i in range(n):
        state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
    lf = float(m["loss_seg"])
    results["train_ms_per_iter"] = round((time.time() - t0) / n * 1e3, 1)
    results["train_loss_initial"] = round(l0, 3)
    assert np.isfinite(lf)

    for k, val in results.items():
        print(f"{k}: {val}")


if __name__ == "__main__":
    main()
