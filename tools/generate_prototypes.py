#!/usr/bin/env python
"""CFFM++ phase A: generate per-video k-means prototypes.

Replaces running the reference's ``dist_test.sh`` with the
``_gene_prototype`` head config (``cffm.b1...vspw2_gene_prototype.py`` +
``cffm_head.py:161-301``): loads a trained CFFM checkpoint, clusters fused
1/8 features of 10 uniformly sampled frames per video (train+val+test
lists), and writes ``<cluster-dir>/<video>/centers.npy``.
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

from vss_cffm_tpu.config import apply_overrides, load_config
from vss_cffm_tpu.data import VSPWVideoDataset
from vss_cffm_tpu.eval import generate_prototypes
from vss_cffm_tpu.models import CFFMSegmentor
from vss_cffm_tpu.train import CheckpointManager, TrainState, build_optimizer
from vss_cffm_tpu.utils import get_logger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--cluster-dir", default=None,
                    help="default: cfg.cluster_dir")
    ap.add_argument("--n-clusters", type=int, default=None,
                    help="default: cfg.proto.n_clusters")
    ap.add_argument("--num-frames", type=int, default=None,
                    help="default: cfg.proto.num_frames")
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()

    cfg = apply_overrides(load_config(args.config), args.options)
    # CLI flags override the config's ProtoConfig (the _gene_prototype file)
    cluster_dir = args.cluster_dir or cfg.cluster_dir
    n_clusters = args.n_clusters or cfg.proto.n_clusters
    num_frames = args.num_frames or cfg.proto.num_frames
    logger = get_logger()
    model = CFFMSegmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    dataset = VSPWVideoDataset(cfg.data.data_root, "train_val_generate_prototype",
                               img_scale=cfg.data.img_scale)

    t = len(cfg.data.dilation) + 1
    sample = jnp.zeros((1, t, *cfg.data.crop_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    tx = build_optimizer(variables["params"], cfg.optim)
    state = TrainState.create(variables, tx)
    params, batch_stats = CheckpointManager(args.checkpoint).load_params(state)

    logger.info(f"generating prototypes for {len(dataset)} videos -> {cluster_dir}")
    generate_prototypes(model, params, batch_stats, dataset, cluster_dir,
                        n_clusters=n_clusters, max_iter=cfg.proto.kmeans_iters,
                        num_frames=num_frames)
    logger.info("done")


if __name__ == "__main__":
    main()
