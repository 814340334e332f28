#!/usr/bin/env python
"""Export a trained segmentor as a portable serialized function.

Parity surface for the reference's ``tools/pytorch2onnx.py``: instead of
ONNX, the TPU-native deployment artifact is a ``jax.export`` StableHLO
module — a self-contained serialized computation (weights baked in) that any
JAX runtime (CPU/GPU/TPU) can reload and execute without the model code.

Usage::

    python tools/export.py configs/cffm_b1_vspw_160k.py CKPT out.stablehlo \
        [--shape 480 480] [--verify]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from vss_cffm_tpu.config import apply_overrides, load_config
from vss_cffm_tpu.models import CFFMSegmentor
from vss_cffm_tpu.train import CheckpointManager, TrainState, build_optimizer
from vss_cffm_tpu.utils import get_logger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("output")
    ap.add_argument("--shape", type=int, nargs=2, default=[480, 480])
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()

    cfg = apply_overrides(load_config(args.config), args.options)
    logger = get_logger()
    model = CFFMSegmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    t = len(cfg.data.dilation) + 1
    sample = jnp.zeros((1, t, *args.shape, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    tx = build_optimizer(variables["params"], cfg.optim)
    state = TrainState.create(variables, tx)
    params, batch_stats = CheckpointManager(args.checkpoint).load_params(state)

    def forward(imgs):
        return model.apply({"params": params, "batch_stats": batch_stats}, imgs, False)

    exported = jax_export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(sample.shape, jnp.float32)
    )
    data = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(data)
    logger.info(f"wrote {args.output} ({len(data) / 1e6:.1f} MB, "
                f"platforms={exported.platforms})")

    if args.verify:
        reloaded = jax_export.deserialize(bytearray(data))
        x = jnp.asarray(np.random.RandomState(0).randn(*sample.shape), jnp.float32)
        a = reloaded.call(x)
        b = forward(x)
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-2, atol=1e-2)
        logger.info("verify: reloaded module matches live forward")


if __name__ == "__main__":
    main()
