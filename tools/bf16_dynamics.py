#!/usr/bin/env python
"""bf16-vs-f32 training-dynamics bound (VERDICT r4 #6).

Trains the same model twice from the same init on the same synthetic
color-mosaic video stream — once with f32 compute, once with the shipped
bf16-compute/f32-params policy — and reports the loss-trajectory and
eval-mIoU deltas. This bounds the one accuracy risk no forward/gradient
parity test covers: whether bf16 *dynamics* (hundreds of steps of rounded
updates) drift away from the f32 trajectory. Reference anchor:
``mmseg/models/decode_heads/decode_head.py:743-835`` (the loss the
trajectories descend).

Usage:
    python tools/bf16_dynamics.py [--steps 300] [--variant b0] [--hw 64]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_color_tree(root: str, hw: int = 64, frames: int = 12,
                    videos=("vid_a", "vid_b"), block: int = 16) -> str:
    """Synthetic VSPW tree where class ≙ block color (same recipe as
    tests/test_learns_segmentation.py, duplicated so tools don't import
    tests)."""
    import cv2
    from PIL import Image

    colors = np.array([[40, 40, 200], [40, 200, 40], [200, 40, 40],
                       [200, 200, 40]], np.uint8)
    rng = np.random.RandomState(1)
    for split, names in (("train", videos), ("val", videos[:1])):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    for v in videos:
        odir = os.path.join(root, "data", v, "origin")
        mdir = os.path.join(root, "data", v, "mask")
        os.makedirs(odir)
        os.makedirs(mdir)
        for i in range(frames):
            cls = rng.randint(0, len(colors), (hw // block, hw // block))
            cls_full = np.kron(cls, np.ones((block, block), int))
            img = colors[cls_full]
            noise = rng.randint(-15, 15, img.shape)
            img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(odir, f"{i:08d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            seg = (cls_full + 1).astype(np.uint8)
            im = Image.fromarray(seg)
            im.putpalette([c for k in range(256) for c in (k, k, k)])
            im.save(os.path.join(mdir, f"{i:08d}.png"))
    return root


def run_once(root: str, dtype, steps: int, variant: str, hw: int,
             num_classes: int = 5, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from vss_cffm_tpu.data import (TrainLoader, VSPWVideoDataset,
                                   iterate_eval)
    from vss_cffm_tpu.eval import ClipEvaluator
    from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
    from vss_cffm_tpu.train import (OptimConfig, TrainState, build_optimizer,
                                    make_train_step)

    ds = VSPWVideoDataset(root, "train", crop_size=(hw, hw),
                          img_scale=(hw, hw))
    loader = TrainLoader(ds, batch_size=2, num_workers=1, seed=seed)
    cfg = build_model_config(variant, num_classes=num_classes)
    model = CFFMSegmentor(cfg, dtype=dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 4, hw, hw, 3)))
    ocfg = OptimConfig(lr=2e-3, warmup_iters=0, warmup_ratio=1.0,
                       max_iters=steps * 10, weight_decay=0.01)
    tx = build_optimizer(variables["params"], ocfg)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)
    key = jax.random.PRNGKey(seed)
    losses = []
    for it, batch in zip(range(steps), loader):
        state, m = step(state, batch, jax.random.fold_in(key, it))
        losses.append(float(m["loss_seg"]))
    val = VSPWVideoDataset(root, "val", img_scale=(hw, hw))
    ev = ClipEvaluator(model, jax.device_get(state.params),
                       jax.device_get(state.batch_stats), num_classes)
    out = ev.run(iterate_eval(val, num_workers=1), dataset=val)
    return np.asarray(losses), float(out["mIoU_seen"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--variant", default="b0")
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp

    root = tempfile.mkdtemp(prefix="vss_bf16dyn_")
    try:
        make_color_tree(root, hw=args.hw)
        loss_f32, miou_f32 = run_once(root, jnp.float32, args.steps,
                                      args.variant, args.hw, seed=args.seed)
        loss_bf16, miou_bf16 = run_once(root, jnp.bfloat16, args.steps,
                                        args.variant, args.hw, seed=args.seed)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    def seg(a, lo, hi):
        return float(np.mean(a[lo:hi]))

    n = args.steps
    print(f"steps={n} variant={args.variant} hw={args.hw}")
    for name, lo, hi in (("first10", 0, 10), ("mid", n // 2 - 5, n // 2 + 5),
                         ("last20", n - 20, n)):
        f, b = seg(loss_f32, lo, hi), seg(loss_bf16, lo, hi)
        print(f"loss[{name:7s}]  f32 {f:.4f}  bf16 {b:.4f}  "
              f"rel-delta {abs(b - f) / max(f, 1e-9):.4f}")
    print(f"final-step loss   f32 {loss_f32[-1]:.4f}  bf16 {loss_bf16[-1]:.4f}")
    print(f"eval mIoU         f32 {miou_f32:.4f}  bf16 {miou_bf16:.4f}  "
          f"delta {miou_bf16 - miou_f32:+.4f}")


if __name__ == "__main__":
    main()
