"""Cityscapes clip dataset: frame arithmetic, reversal aug, shapes."""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

from vss_cffm_tpu.data.cityscapes import CityscapesClipDataset, _shift_frame


@pytest.fixture(scope="module")
def city_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cityscapes"))
    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "leftImg8bit_sequence", "train", "aachen")
    ann_dir = os.path.join(root, "gtFine", "train", "aachen")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    # sequence frames 000000..000029, annotated frame 000019
    for f in range(30):
        img = rng.randint(0, 255, (64, 128, 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"aachen_000000_{f:06d}_leftImg8bit.png"), img)
    gt = rng.randint(0, 19, (64, 128)).astype(np.uint8)
    Image.fromarray(gt).save(
        os.path.join(ann_dir, "aachen_000000_000019_gtFine_labelTrainIds.png"))
    return root


def test_shift_frame():
    assert _shift_frame("aachen_000000_000019_leftImg8bit.png", -9) == \
        "aachen_000000_000010_leftImg8bit.png"
    assert _shift_frame("aachen_000000_000019_leftImg8bit.png", 3) == \
        "aachen_000000_000022_leftImg8bit.png"


def test_train_item(city_root):
    ds = CityscapesClipDataset(city_root, "train", crop_size=(64, 64),
                               img_scale=(128, 64))
    assert len(ds) == 1
    item = ds.get_train_item(0, np.random.RandomState(0))
    assert item["imgs"].shape == (4, 64, 64, 3)
    assert item["labels"].shape == (4, 64, 64)
    # labels replicate the single annotated frame
    for t in range(1, 4):
        np.testing.assert_array_equal(item["labels"][t], item["labels"][0])


def test_reversal_uses_positive_offsets(city_root):
    ds = CityscapesClipDataset(city_root, "train")
    # force the reversal branch deterministically
    class FixedRng(np.random.RandomState):
        def rand(self, *a):
            return 0.0  # < 0.5 -> reversal

    names = ds._clip_names("aachen_000000_000019_leftImg8bit.png", [9, 6, 3])
    assert names[0].split("_")[2] == "000028"


def test_test_item(city_root):
    ds = CityscapesClipDataset(city_root, "train", img_scale=(128, 64))
    item = ds.get_test_item(0)
    t, h, w, _ = item["imgs"].shape
    assert t == 4 and h % 32 == 0 and w % 32 == 0
    assert item["ori_shape"] == (64, 128)
    assert ds.load_gt(0).shape == (64, 128)
