#!/usr/bin/env python
"""Evaluate a checkpoint on VSPW (mIoU / FWIoU / VC) and/or dump predictions.

Replaces the reference eval stack (``tools/test.py`` + ``apis/test.py``):
streaming clip eval with an on-device confusion matrix; ``--format-only``
writes palette PNGs compatible with the reference's ``result_submission``
layout (and thus with ``VC_perclip.py``-style offline scoring — though VC is
also computed inline here with ``--vc``).

Usage::

    python tools/test.py configs/cffm_b1_vspw_160k.py work_dirs/.../ckpt \
        [--split val] [--eval] [--vc] [--format-only --show-dir DIR]
"""

from __future__ import annotations

import argparse
import json
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
from vss_cffm_tpu.data import VSPWVideoDataset, iterate_eval
from vss_cffm_tpu.eval import ClipEvaluator, ClusterStore
from vss_cffm_tpu.models.segmentor import build_segmentor
from vss_cffm_tpu.train import CheckpointManager, TrainState, build_optimizer
from vss_cffm_tpu.utils import enable_compilation_cache, get_logger


def load_state(cfg, model, ckpt, sample, finetune, store):
    if ckpt.endswith((".pth", ".pt")):
        # reference-format PyTorch checkpoint → converted in place
        from vss_cffm_tpu.utils.torch_convert import convert_segmentor, load_torch_state_dict

        converted = convert_segmentor(load_torch_state_dict(ckpt), cfg.model)
        return converted["params"], converted["batch_stats"]
    init_kwargs = {}
    if finetune:
        init_kwargs["cluster_centers"] = (
            jnp.zeros((1, store.pad_to, cfg.model.head.embed_dim)),
            jnp.ones((1, store.pad_to), bool),
        )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample, **init_kwargs)
    tx = build_optimizer(variables["params"], cfg.optim)
    state = TrainState.create(variables, tx)
    mgr = CheckpointManager(ckpt)
    params, batch_stats = mgr.load_params(state)
    return params, batch_stats


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--split", default="val")
    ap.add_argument("--eval", action="store_true", default=True)
    ap.add_argument("--no-eval", dest="eval", action="store_false")
    ap.add_argument("--vc", action="store_true",
                    help="compute VC8/VC16 inline; on multi-process runs combine "
                         "with --streaming (shards by whole video, keeping each "
                         "video's frame sequence local so VC stays exact — the "
                         "default frame-strided sharding would split sequences)")
    ap.add_argument("--streaming", action="store_true",
                    help="video-sequential eval with per-frame feature cache (~4x faster, "
                         "identical outputs); multi-process: shards by video")
    ap.add_argument("--aug-test", action="store_true",
                    help="multi-scale (0.5..1.75) + flip TTA (reference --aug-test)")
    ap.add_argument("--format-only", action="store_true")
    ap.add_argument("--show", action="store_true",
                    help="write blended overlay visualizations (apis.show_result) "
                         "to <show-dir>_vis (reference --show / show_result_pyplot, "
                         "``mmseg/apis/inference.py:107-128``; headless: saved, not "
                         "displayed)")
    ap.add_argument("--opacity", type=float, default=0.5,
                    help="overlay opacity for --show (reference --opacity)")
    ap.add_argument("--show-dir", default="result_submission")
    ap.add_argument("--out", help="dump metrics JSON (.json) or raw per-frame "
                                  "masks pickle (.pkl, ≙ reference --out res.pkl)")
    ap.add_argument("--efficient-test", action="store_true",
                    help="with --out *.pkl: spill each mask to <out>_masks/*.npy "
                         "and pickle the paths (reference efficient_test)")
    ap.add_argument("--host-normalize", action="store_true",
                    help="normalize images on the host instead of on device "
                         "(device normalization is bit-identical and 4x less H2D)")
    ap.add_argument("--shape-census", action="store_true",
                    help="print the set of jit shapes this eval would compile "
                         "(from image headers; no device work) and exit")
    ap.add_argument("--options", nargs="*", default=[])
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize() "
                         "(auto-detected on TPU pods; explicit via the flags below)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (tools/dist_test.sh sets it)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.distributed:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    cfg = apply_overrides(load_config(args.config), args.options)
    logger = get_logger()
    if jax.process_index() != 0:  # rank-0-only INFO logging
        import logging

        logger.setLevel(logging.WARNING)
    model = build_segmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    finetune = cfg.model.head.mode == "finetune"
    store = ClusterStore(cfg.cluster_dir) if finetune else None

    dataset = VSPWVideoDataset(
        cfg.data.data_root, args.split, dilation=cfg.data.dilation,
        img_scale=cfg.data.img_scale,
    )

    from vss_cffm_tpu.eval.census import eval_shape_census

    census = eval_shape_census(
        dataset, tta_ratios=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75) if args.aug_test else None)
    logger.info(
        f"eval shape census: {census['num_compiles']} distinct jit shape(s) over "
        f"{census['num_frames']} frames / {census['num_videos']} videos "
        f"(persistent compile cache absorbs repeats across runs)")
    if args.shape_census:
        for shape, n in sorted(census["shapes"].items(), key=lambda kv: -kv[1]):
            t_, ah, aw, oh, ow = shape
            print(f"T={t_} aligned=({ah},{aw}) ori=({oh},{ow}): {n} frames")
        return
    t = len(cfg.data.dilation) + 1
    sample = jnp.zeros((1, t, *cfg.data.crop_size, 3), jnp.float32)
    params, batch_stats = load_state(cfg, model, args.checkpoint, sample, finetune, store)

    # multi-process eval: each process evaluates a shard, then the (C, C)
    # confusion matrices are summed across processes (replaces the
    # reference's pickle gather, ``apis/test.py:107-243``)
    proc_id, n_procs = jax.process_index(), jax.process_count()
    normalize = args.host_normalize  # default: uint8 H2D + device normalize

    # raw per-frame mask dump (reference ``--out res.pkl``): collected in
    # dataset order; with --efficient-test masks spill to .npy files and the
    # pickle holds their paths (reference ``np2tmp``, ``apis/test.py:15-33``)
    dump_preds = bool(args.out) and args.out.endswith(".pkl")
    preds: dict[int, object] = {}
    on_pred = None
    if dump_preds:
        mask_dir = args.out[: -len(".pkl")] + "_masks"
        if args.efficient_test:
            os.makedirs(mask_dir, exist_ok=True)

        def on_pred(item, pred):
            if args.efficient_test:
                path = os.path.join(mask_dir, f"{item['index']:08d}.npy")
                np.save(path, pred.astype(np.uint8))
                preds[item["index"]] = path
            else:
                preds[item["index"]] = pred.astype(np.uint8)

    if args.show:
        import cv2

        from vss_cffm_tpu.apis import show_result
        from vss_cffm_tpu.data.palette import VSPW_PALETTE

        vis_dir = args.show_dir.rstrip("/") + "_vis"
        dump_fn = on_pred

        def on_pred(item, pred, _dump=dump_fn):
            if _dump is not None:
                _dump(item, pred)
            blend = show_result(dataset._img_path(item["video"], item["frame"]),
                                pred, palette=VSPW_PALETTE, opacity=args.opacity)
            dst = os.path.join(vis_dir, item["video"])
            os.makedirs(dst, exist_ok=True)
            cv2.imwrite(os.path.join(
                dst, item["frame"].rsplit(".", 1)[0] + ".png"), blend)

    save_dir = args.show_dir if args.format_only else None
    tc = cfg.model.test_cfg  # ≙ reference test_cfg=dict(mode='whole'|'slide', ...)
    if args.streaming:
        from vss_cffm_tpu.eval.evaluator import StreamingVideoEvaluator

        if tc.mode != "whole":
            logger.warning("--streaming uses whole-image inference; ignoring "
                           f"test_cfg.mode={tc.mode!r} (drop --streaming for slide)")
        evaluator = StreamingVideoEvaluator(model, params, batch_stats,
                                            cfg.model.head.num_classes,
                                            cluster_store=store,
                                            max_lag=-min(cfg.data.dilation, default=0),
                                            device_normalize=not normalize)
        # shard by video: keeps the feature cache local and VC well-defined
        videos = dataset.videos[proc_id::n_procs] if n_procs > 1 else None
        evaluator.run_streaming(dataset, keep_for_vc=args.vc, save_dir=save_dir,
                                videos=videos, on_pred=on_pred)
    else:
        from vss_cffm_tpu.data import iterate_eval_tta

        evaluator = ClipEvaluator(model, params, batch_stats,
                                  cfg.model.head.num_classes, cluster_store=store,
                                  mode=tc.mode, crop_size=tc.crop_size,
                                  stride=tc.stride)
        iterate = iterate_eval_tta if args.aug_test else iterate_eval
        items = iterate(dataset, num_workers=cfg.data.num_workers,
                        shard_id=proc_id, num_shards=n_procs, normalize=normalize)
        evaluator.run(items, dataset=dataset, keep_for_vc=args.vc, save_dir=save_dir,
                      on_pred=on_pred)
    evaluator.aggregate_across_processes()
    metrics = evaluator.summary(with_vc=args.vc)
    summary = {k: v for k, v in metrics.items() if np.isscalar(v) or isinstance(v, float)}
    if args.eval and proc_id == 0:
        # per-class IoU/Acc tables (reference ``custom.py:2678-2709``)
        from vss_cffm_tpu.data.palette import VSPW_CLASSES
        from vss_cffm_tpu.eval.metrics import format_class_table

        names = VSPW_CLASSES if len(VSPW_CLASSES) == cfg.model.head.num_classes else None
        logger.info("\n" + format_class_table(evaluator.confusion, names))
    logger.info(f"metrics: {summary}")
    if args.out:
        if dump_preds:
            import pickle

            # per-process shard file on multi-host runs (each process only
            # holds its shard's masks); exact name when single-process
            path = args.out if n_procs == 1 else f"{args.out}.rank{proc_id}"
            with open(path, "wb") as f:
                pickle.dump([preds[k] for k in sorted(preds)], f)
            logger.info(f"dumped {len(preds)} raw masks to {path}")
        elif proc_id == 0:
            with open(args.out, "w") as f:
                json.dump({k: float(v) for k, v in summary.items()}, f, indent=2)


if __name__ == "__main__":
    main()
