"""Synthetic VSPW tree for data-layer tests (the fixture the reference lacks —
SURVEY.md §4 calls for a fake ``data/<video>/{origin,mask}`` tree to exercise
clip samplers)."""

import os

import cv2
import numpy as np
from PIL import Image


def make_fake_vspw(root, videos=("vid_a", "vid_b"), frames_per_video=15, hw=(72, 96),
                   num_classes=124):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(42)
    h, w = hw
    for split, names in (("train", videos), ("val", videos[:1]), ("test", videos[1:])):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    for v in videos:
        odir = os.path.join(root, "data", v, "origin")
        mdir = os.path.join(root, "data", v, "mask")
        os.makedirs(odir, exist_ok=True)
        os.makedirs(mdir, exist_ok=True)
        for i in range(frames_per_video):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(os.path.join(odir, f"{i:08d}.jpg"), img)
            # raw labels in [0, num_classes]; 0 is "others" -> ignore.
            # (fromarray(..., mode="P") corrupts data — use L + putpalette)
            seg = rng.randint(0, num_classes + 1, (h, w)).astype(np.uint8)
            img_p = Image.fromarray(seg)
            img_p.putpalette([v for k in range(256) for v in (k, k, k)])
            img_p.save(os.path.join(mdir, f"{i:08d}.png"))
    return root
