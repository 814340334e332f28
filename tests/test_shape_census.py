"""Eval-shape census (VERDICT r1 #7: eval shape discipline)."""

import os

import cv2
import numpy as np

from tests.fixtures import make_fake_vspw
from vss_cffm_tpu.data.vspw import VSPWVideoDataset
from vss_cffm_tpu.eval.census import eval_shape_census


def _add_video(root, name, hw, n_frames, split="val"):
    odir = os.path.join(root, "data", name, "origin")
    mdir = os.path.join(root, "data", name, "mask")
    os.makedirs(odir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)
    h, w = hw
    for i in range(n_frames):
        cv2.imwrite(os.path.join(odir, f"{i:08d}.jpg"),
                    np.zeros((h, w, 3), np.uint8))
        cv2.imwrite(os.path.join(mdir, f"{i:08d}.png"),
                    np.zeros((h, w), np.uint8))
    with open(os.path.join(root, f"{split}.txt"), "a") as f:
        f.write(name + "\n")


def test_census_uniform_dataset_is_one_shape(tmp_path):
    root = make_fake_vspw(str(tmp_path), frames_per_video=12)
    ds = VSPWVideoDataset(root, "val")
    c = eval_shape_census(ds)
    assert c["num_compiles"] == 1
    ((t, ah, aw, oh, ow),) = c["shapes"].keys()
    assert t == 4 and ah % 32 == 0 and aw % 32 == 0
    assert c["num_frames"] == sum(len(f) for f in ds.frames.values())


def test_census_counts_aspect_ratios_and_tta(tmp_path):
    root = make_fake_vspw(str(tmp_path), frames_per_video=12)  # 72x96 videos
    _add_video(root, "vid_wide", (48, 128), 11)   # different aspect ratio
    _add_video(root, "vid_wide2", (48, 128), 11)  # same ratio -> same shape
    ds = VSPWVideoDataset(root, "val")
    c = eval_shape_census(ds)
    assert c["num_videos"] == 3
    assert c["num_compiles"] == 2  # two aspect-ratio groups, not three videos

    tta = eval_shape_census(ds, tta_ratios=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75))
    # at most 6 ratios x 2 groups; small sizes may collide after /32 alignment
    assert c["num_compiles"] < tta["num_compiles"] <= 12
