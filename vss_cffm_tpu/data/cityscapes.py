"""Cityscapes clip dataset (video sequences with sparse annotations).

Re-design of ``CustomDataset_cityscape_clips`` / ``CityscapesDataset_clips``
(reference ``mmseg/datasets/custom.py:801-1460``,
``mmseg/datasets/cityscapes.py:427+``): Cityscapes annotates one frame per
sequence; clip frames are derived by *frame-number arithmetic* on the
``{city}_{seq}_{frame}_leftImg8bit.png`` filename over the
``leftImg8bit_sequence`` directory. Reversal augmentation negates the
dilation offsets (``custom.py:1060-1066``) rather than reversing a frame
list. Only the annotated (target, last) frame carries ground truth — pair
with ``losses.clip_ce_loss_city`` which supervises only the last frame
(``decode_head.py:1041-1136``); the label tensor replicates the target GT
across the clip for pipeline-shape uniformity.

Tree layout::

    data_root/
      leftImg8bit_sequence/{split}/{city}/{city}_{seq}_{frame}_leftImg8bit.png
      gtFine/{split}/{city}/{city}_{seq}_{frame}_gtFine_labelTrainIds.png
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from . import transforms as T

__all__ = ["CITYSCAPES_CLASSES", "CITYSCAPES_PALETTE", "CityscapesClipDataset"]

CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
)

CITYSCAPES_PALETTE = (
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
    (0, 0, 230), (119, 11, 32),
)

_IMG_SUFFIX = "_leftImg8bit.png"
_SEG_SUFFIX = "_gtFine_labelTrainIds.png"


def _shift_frame(img_name: str, offset: int) -> str:
    """{city}_{seq}_{frame}{suffix} with the frame id shifted by ``offset``."""
    parts = img_name.split("_")
    frame = str(int(parts[-2]) + offset).rjust(6, "0")
    return "_".join(parts[:-2] + [frame] + parts[-1:])


class CityscapesClipDataset:
    def __init__(
        self,
        data_root: str,
        split: str = "train",
        dilation=(-9, -6, -3),
        crop_size: tuple[int, int] = (512, 512),
        img_scale: tuple[int, int] = (2048, 1024),
        flip_video: bool = True,
    ):
        self.data_root = data_root
        self.split = split
        self.dilation = list(dilation)
        self.crop_size = crop_size
        self.img_scale = img_scale
        self.flip_video = flip_video
        self.img_dir = os.path.join(data_root, "leftImg8bit_sequence", split)
        self.ann_dir = os.path.join(data_root, "gtFine", split)

        self.samples: list[tuple[str, str]] = []  # (rel_img, rel_seg)
        for city in sorted(os.listdir(self.ann_dir)):
            cdir = os.path.join(self.ann_dir, city)
            for name in sorted(os.listdir(cdir)):
                if name.endswith(_SEG_SUFFIX):
                    img = name.replace(_SEG_SUFFIX, _IMG_SUFFIX)
                    self.samples.append((os.path.join(city, img), os.path.join(city, name)))

    def __len__(self) -> int:
        return len(self.samples)

    def _clip_names(self, rel_img: str, dilation: list[int]) -> list[str]:
        return [_shift_frame(rel_img, d) for d in dilation] + [rel_img]

    def _load_clip(self, rel_img: str, dilation: list[int]) -> list[np.ndarray]:
        imgs = []
        for rel in self._clip_names(rel_img, dilation):
            img = cv2.imread(os.path.join(self.img_dir, rel), cv2.IMREAD_COLOR)
            assert img is not None, rel
            imgs.append(img)
        return imgs

    def get_train_item(self, idx: int, rng: np.random.RandomState) -> dict:
        rel_img, rel_seg = self.samples[idx]
        # reversal aug: negate the dilation offsets (``custom.py:1060-1066``)
        dilation = [-d for d in self.dilation] if (self.flip_video and rng.rand() < 0.5) \
            else self.dilation
        imgs = self._load_clip(rel_img, dilation)
        gt = np.array(Image.open(os.path.join(self.ann_dir, rel_seg))).astype(np.uint8)
        segs = [gt.copy() for _ in imgs]  # replicate target GT for shape uniformity
        imgs, segs = T.random_scale_clip(imgs, segs, rng, self.img_scale)
        imgs, segs = T.random_crop_clip(imgs, segs, rng, self.crop_size)
        imgs, segs, _ = T.random_flip_clip(imgs, segs, rng)
        imgs = T.photometric_distortion_clip(imgs, rng)
        imgs = T.normalize_clip(imgs)
        imgs, segs = T.pad_clip(imgs, segs, self.crop_size)
        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "labels": np.stack(segs).astype(np.int32),
            "video": rel_img.rsplit("_", 2)[0],
            "frame": rel_img,
        }

    def get_test_item(self, idx: int) -> dict:
        rel_img, _ = self.samples[idx]
        imgs = self._load_clip(rel_img, self.dilation)
        ori_shape = imgs[0].shape[:2]
        imgs, _ = T.aligned_resize_clip(imgs, None, self.img_scale)
        return {
            "imgs": np.stack(T.normalize_clip(imgs)).astype(np.float32),
            "ori_shape": ori_shape,
            "video": rel_img.rsplit("_", 2)[0],
            "frame": rel_img,
        }

    def load_gt(self, idx: int) -> np.ndarray:
        _, rel_seg = self.samples[idx]
        return np.array(Image.open(os.path.join(self.ann_dir, rel_seg))).astype(np.uint8)
