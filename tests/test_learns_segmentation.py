"""End-to-end learning test: the full train stack must actually learn.

Synthetic VSPW-style videos where class is determined by color (block
mosaics): after a short training run through TrainLoader + the jitted train
step, eval mIoU through the ClipEvaluator must be far above chance. This
covers what no unit test does — optimizer/loss/BN/augmentation/eval wiring
producing real learning together.
"""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vss_cffm_tpu.data import TrainLoader, VSPWVideoDataset, iterate_eval
from vss_cffm_tpu.eval import ClipEvaluator
from vss_cffm_tpu.train import OptimConfig, TrainState, build_optimizer, make_train_step
from test_heads_segmentor import tiny_segmentor

# distinct colors -> classes (BGR)
COLORS = np.array([[40, 40, 200], [40, 200, 40], [200, 40, 40], [200, 200, 40]], np.uint8)


def make_color_vspw(root, videos=("vid_a", "vid_b"), frames=12, hw=(64, 64), block=16):
    rng = np.random.RandomState(1)
    h, w = hw
    for split, names in (("train", videos), ("val", videos[:1])):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    for v in videos:
        odir = os.path.join(root, "data", v, "origin")
        mdir = os.path.join(root, "data", v, "mask")
        os.makedirs(odir), os.makedirs(mdir)
        for i in range(frames):
            cls = rng.randint(0, len(COLORS), (h // block, w // block))
            cls_full = np.kron(cls, np.ones((block, block), int))
            img = COLORS[cls_full]
            noise = rng.randint(-15, 15, img.shape)
            img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(odir, f"{i:08d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            seg = (cls_full + 1).astype(np.uint8)  # raw labels 1..K (0=ignore)
            im = Image.fromarray(seg)
            im.putpalette([c for k in range(256) for c in (k, k, k)])
            im.save(os.path.join(mdir, f"{i:08d}.png"))
    return root


@pytest.mark.slow
def test_training_learns_color_segmentation(tmp_path):
    root = make_color_vspw(str(tmp_path))
    ds = VSPWVideoDataset(root, "train", crop_size=(64, 64), img_scale=(64, 64))
    loader = TrainLoader(ds, batch_size=2, num_workers=2)

    model = tiny_segmentor()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)))
    cfg = OptimConfig(lr=2e-3, warmup_iters=0, warmup_ratio=1.0, max_iters=10_000,
                      weight_decay=0.0)
    tx = build_optimizer(variables["params"], cfg)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)

    key = jax.random.PRNGKey(0)
    losses = []
    for it, batch in zip(range(60), loader):
        state, m = step(state, batch, jax.random.fold_in(key, it))
        losses.append(float(m["loss_seg"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]

    val = VSPWVideoDataset(root, "val", img_scale=(64, 64))
    ev = ClipEvaluator(model, jax.device_get(state.params),
                       jax.device_get(state.batch_stats), 5)
    out = ev.run(iterate_eval(val, num_workers=2), dataset=val)
    # 4 active classes, chance mIoU ~0.25/anything; a learned model separates
    # colors nearly perfectly
    assert out["mIoU_seen"] > 0.6, out
