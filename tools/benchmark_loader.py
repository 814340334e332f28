#!/usr/bin/env python
"""Host data-path throughput: can the loader keep the chip fed?

Builds a synthetic VSPW tree at the real frame geometry (480p JPEGs),
then measures ``TrainLoader`` steady-state throughput (JPEG decode +
clip-synchronized augmentation + batching; device transfer excluded).
Compare against the train step's device demand (~181 frames/s for
CFFM-B1 at the reference global batch on one v5e chip): a single host
below that number must shard loading across hosts (``shard_id``/
``num_shards``) or pre-decode.

Usage: python tools/benchmark_loader.py [--frames 480 853] [--batches 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_tree(root: str, hw, videos: int = 3, frames: int = 24) -> str:
    import cv2

    rng = np.random.RandomState(0)
    names = [f"vid_{i}" for i in range(videos)]
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    h, w = hw
    for v in names:
        odir = os.path.join(root, "data", v, "origin")
        mdir = os.path.join(root, "data", v, "mask")
        os.makedirs(odir)
        os.makedirs(mdir)
        # natural-image-like content so JPEG decode cost is realistic
        base = rng.randint(0, 255, (h, w, 3), np.uint8)
        for i in range(frames):
            img = np.roll(base, i * 7, axis=1)
            cv2.imwrite(os.path.join(odir, f"{i:08d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
            cv2.imwrite(os.path.join(mdir, f"{i:08d}.png"),
                        rng.randint(0, 124, (h, w)).astype(np.uint8))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-hw", type=int, nargs=2, default=(480, 853))
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--worker-mode", default="thread",
                    choices=["thread", "process"],
                    help="process = spawned workers + shared-memory batch "
                         "transport (reference DataLoader shape)")
    ap.add_argument("--batches", type=int, default=20)
    args = ap.parse_args()

    from vss_cffm_tpu.data import TrainLoader, VSPWVideoDataset
    from vss_cffm_tpu.native import available as native_available

    with tempfile.TemporaryDirectory(prefix="loaderbench_") as root:
        build_tree(root, tuple(args.frames_hw))
        dataset = VSPWVideoDataset(root, "train", crop_size=(480, 480))
        loader = TrainLoader(dataset, args.batch_size,
                             num_workers=args.num_workers, device_normalize=True,
                             worker_mode=args.worker_mode)
        it = iter(loader)
        next(it)  # warm the pool / caches
        t0 = time.perf_counter()
        frames = 0
        for _ in range(args.batches):
            batch = next(it)
            frames += batch["imgs"].shape[0] * batch["imgs"].shape[1]
        dt = time.perf_counter() - t0
        print(f"native decoder available: {native_available()}")
        print(f"{frames / dt:.1f} frames/s host decode+augment "
              f"({args.batch_size}-clip batches, {args.num_workers} "
              f"{args.worker_mode} workers)")


if __name__ == "__main__":
    main()
