#!/usr/bin/env python
"""Train a CFFM/CFFM++ segmentor on a TPU mesh.

The explicit training loop replacing the mmcv IterBasedRunner + hook stack
(reference ``tools/train.py`` + ``mmseg/apis/train.py``): data-parallel over
every visible device via one jitted train step, TextLogger-style cadence,
checkpoints every N iters, resume/load-from.

Usage::

    python tools/train.py configs/cffm_b1_vspw_160k.py \
        [--work-dir DIR] [--load-from CKPT] [--resume-from CKPT] \
        [--options data.batch_size=8 optim.lr=6e-5]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS=cpu even though the axon TPU plugin would otherwise win
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vss_cffm_tpu.config import apply_overrides, load_config
from vss_cffm_tpu.data import TrainLoader, VSPWVideoDataset
from vss_cffm_tpu.data.palette import VSPW_CLASSES, VSPW_PALETTE
from vss_cffm_tpu.eval import ClusterStore
from vss_cffm_tpu.models.segmentor import build_segmentor
from vss_cffm_tpu.parallel import create_mesh, replicate, shard_batch
from vss_cffm_tpu.train import (
    CheckpointManager,
    TrainState,
    build_optimizer,
    make_train_step,
    poly_schedule,
)
from vss_cffm_tpu.utils import enable_compilation_cache, get_logger


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--work-dir")
    ap.add_argument("--load-from")
    ap.add_argument("--resume-from")
    ap.add_argument("--seed", type=int)
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="run val mIoU every N iters (0 = only rely on checkpoints; "
                         "mirrors the reference EvalHook)")
    ap.add_argument("--profile-dir",
                    help="capture a jax.profiler trace of iterations 10-13 here")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize() "
                         "(auto-detected on TPU pods; explicit via the flags below)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (tools/dist_train.sh sets it)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()

    if args.distributed:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    cfg = apply_overrides(load_config(args.config), args.options)
    work_dir = args.work_dir or cfg.work_dir
    logger = get_logger(work_dir)
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"config: {cfg}")

    seed = args.seed if args.seed is not None else cfg.seed
    # shard over as many devices as the global batch divides into
    devices = jax.devices()
    n_use = max(d for d in range(1, len(devices) + 1) if cfg.data.batch_size % d == 0)
    if n_use < len(devices):
        logger.warning(f"batch {cfg.data.batch_size} not divisible by "
                       f"{len(devices)} devices; using {n_use}")
    mesh = create_mesh(devices[:n_use])

    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    model = build_segmentor(cfg.model, dtype=dtype)
    finetune = cfg.model.head.mode == "finetune"

    proc_id, n_procs = jax.process_index(), jax.process_count()
    if proc_id != 0:  # rank-0-only INFO logging (mmcv get_root_logger semantics)
        logger.setLevel(logging.WARNING)
    dataset = VSPWVideoDataset(
        cfg.data.data_root, "train", dilation=cfg.data.dilation,
        crop_size=cfg.data.crop_size, img_scale=cfg.data.img_scale,
    )
    assert cfg.data.batch_size % n_procs == 0
    loader = TrainLoader(dataset, cfg.data.batch_size // n_procs, seed=seed,
                         num_workers=cfg.data.num_workers,
                         shard_id=proc_id, num_shards=n_procs,
                         device_normalize=True)
    store = ClusterStore(cfg.cluster_dir) if finetune else None

    # ---- init -------------------------------------------------------------
    t, (h, w) = len(cfg.data.dilation) + 1, cfg.data.crop_size
    sample = jnp.zeros((1, t, h, w, 3), jnp.float32)
    init_kwargs = {}
    if finetune:
        init_kwargs["cluster_centers"] = (
            jnp.zeros((1, store.pad_to, cfg.model.head.embed_dim)),
            jnp.ones((1, store.pad_to), bool),
        )
    variables = jax.jit(model.init, static_argnums=())(jax.random.PRNGKey(seed), sample,
                                                       **init_kwargs)
    logger.info(
        f"params: total {count_params(variables['params']):,} | "
        f"backbone {count_params(variables['params']['backbone']):,} | "
        f"head {count_params(variables['params']['decode_head']):,}"
    )

    tx = build_optimizer(variables["params"], cfg.optim)
    state = TrainState.create(variables, tx)

    ckpt = CheckpointManager(os.path.join(work_dir, "ckpt"))
    if args.resume_from or cfg.resume_from:
        mgr = CheckpointManager(args.resume_from or cfg.resume_from)
        state = mgr.restore(state)
        logger.info(f"resumed from step {int(state.step)}")
    elif args.load_from or cfg.load_from:
        src = args.load_from or cfg.load_from
        if src.endswith((".pth", ".pt")):
            # warm start from a reference-format PyTorch checkpoint (e.g.
            # pretrained mit_bX.pth into the backbone, or a full CFFM ckpt
            # for CFFM++ finetune — reference ``--load-from`` semantics)
            from vss_cffm_tpu.utils.torch_convert import (
                convert_backbone,
                convert_segmentor,
                load_torch_state_dict,
            )

            def merge(dst, src_tree):
                # recursive overlay: checkpoint leaves win, freshly-initialised
                # leaves survive where the ckpt has none (strict=False
                # semantics — finetune heads add modules absent from a CFFM
                # checkpoint, and mit_bX.pth covers only the backbone)
                for k, v in src_tree.items():
                    if isinstance(v, dict) and isinstance(dst.get(k), dict):
                        merge(dst[k], v)
                    else:
                        dst[k] = v

            sd = load_torch_state_dict(src)
            dst = jax.tree.map(lambda x: x, state.params)  # shallow rebuild
            if any(k.startswith("decode_head.") for k in sd):
                converted = convert_segmentor(sd, cfg.model)
                merge(dst, converted["params"])
                state = state.replace(params=dst, batch_stats=converted["batch_stats"])
            else:
                merge(dst, {"backbone": convert_backbone(sd, cfg.model.backbone_config.depths)})
                state = state.replace(params=dst)
            logger.info(f"warm-started from PyTorch checkpoint {src}")
        else:
            mgr = CheckpointManager(src)
            params, batch_stats = mgr.load_params(state)
            state = state.replace(params=params, batch_stats=batch_stats)
            logger.info("warm-started params from checkpoint")

    state = replicate(state, mesh)
    step_fn = make_train_step(model, tx)
    schedule = poly_schedule(cfg.optim)
    base_rng = jax.random.PRNGKey(seed + 1)

    # ---- loop -------------------------------------------------------------
    start = int(state.step)
    t0 = time.time()
    window_losses = []
    val_ds = val_eval = None  # built lazily at the first eval interval
    for it, batch in zip(range(start, cfg.optim.max_iters), loader):
        device_batch = {
            "imgs": batch["imgs"],
            "labels": batch["labels"],
        }
        if finetune:
            device_batch["cluster_centers"] = store.batch(batch["videos"])
        device_batch = shard_batch(device_batch, mesh)
        state, metrics = step_fn(state, device_batch, jax.random.fold_in(base_rng, it))
        window_losses.append(metrics)

        if (it + 1) % cfg.log_interval == 0:
            loss = float(np.mean([float(m["loss_seg"]) for m in window_losses]))
            acc = float(np.mean([float(m["acc_seg"]) for m in window_losses]))
            dt = (time.time() - t0) / len(window_losses)
            logger.info(
                f"iter [{it + 1}/{cfg.optim.max_iters}] lr {float(schedule(it)):.3e} "
                f"loss {loss:.4f} acc_seg {acc:.2f} time {dt:.3f}s/iter "
                f"({cfg.data.batch_size * (len(cfg.data.dilation) + 1) / dt:.1f} frames/s)"
            )
            window_losses, t0 = [], time.time()

        if args.profile_dir and it == start + 9:
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and it == start + 13:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {args.profile_dir}")

        if args.eval_interval and (it + 1) % args.eval_interval == 0:
            from vss_cffm_tpu.data import iterate_eval
            from vss_cffm_tpu.eval import ClipEvaluator

            # each process evaluates its frame shard; confusion matrices are
            # then summed across processes so every rank logs global metrics.
            # dataset + evaluator persist across intervals (params are jit
            # arguments, so set_params reuses the compiled forward; uint8
            # items + device normalize as in tools/test.py)
            if val_eval is None:
                val_ds = VSPWVideoDataset(cfg.data.data_root, "val",
                                          dilation=cfg.data.dilation,
                                          img_scale=cfg.data.img_scale)
                host_state = jax.device_get(state)
                val_eval = ClipEvaluator(model, host_state.params,
                                         host_state.batch_stats,
                                         cfg.model.head.num_classes,
                                         cluster_store=store)
            else:
                host_state = jax.device_get(state)
                val_eval.set_params(host_state.params, host_state.batch_stats)
                val_eval.reset()
            val_eval.run(iterate_eval(val_ds, num_workers=cfg.data.num_workers,
                                      shard_id=proc_id, num_shards=n_procs,
                                      normalize=False),
                         dataset=val_ds)
            val_eval.aggregate_across_processes()
            m = val_eval.summary()
            logger.info(f"eval @ {it + 1}: mIoU {m['mIoU']:.4f} "
                        f"mIoU_seen {m['mIoU_seen']:.4f} FWIoU {m['FWIoU']:.4f}")

        if (it + 1) % cfg.checkpoint_interval == 0 or (it + 1) == cfg.optim.max_iters:
            ckpt.save(
                jax.device_get(state),
                metadata={
                    "classes": list(VSPW_CLASSES),
                    "palette": [list(p) for p in VSPW_PALETTE],
                    "config": cfg,
                },
            )
            logger.info(f"saved checkpoint at iter {it + 1}")


if __name__ == "__main__":
    main()
