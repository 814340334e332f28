"""Clip dataset + transform semantics (synthetic VSPW tree)."""

import numpy as np
import pytest

from fixtures import make_fake_vspw
from vss_cffm_tpu.data import TrainLoader, VSPWVideoDataset, iterate_eval
from vss_cffm_tpu.data import transforms as T
from vss_cffm_tpu.data.vspw import reduce_zero_label


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    return make_fake_vspw(str(tmp_path_factory.mktemp("vspw")))


def test_reduce_zero_label():
    seg = np.array([[0, 1, 124, 255]], np.uint8)
    out = reduce_zero_label(seg)
    assert out.tolist() == [[255, 0, 123, 255]]


def test_train_sampler_window(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "train")
    assert len(ds) == 2
    rng = np.random.RandomState(0)
    for _ in range(20):
        sample, frames = ds.sample_train_clip(0, rng)
        assert len(sample.frame_indices) == 4
        assert sample.frame_indices[-1] == max(sample.frame_indices)
        assert all(0 <= i < 15 for i in sample.frame_indices)
        d = np.diff(sample.frame_indices)
        assert d.tolist() == [3, 3, 3]  # dilation [-9,-6,-3] + target


def test_test_sampler_special_cases(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "val")
    # reference special-case table for early frames (custom.py:2376-2388)
    expect = {
        0: [0], 1: [1], 2: [2], 3: [0, 1, 2, 3], 4: [0, 2, 3, 4], 5: [0, 2, 4, 5],
        6: [0, 2, 4, 6], 7: [0, 3, 5, 7], 8: [0, 3, 6, 8], 9: [0, 3, 6, 9],
        12: [3, 6, 9, 12],
    }
    for t, want in expect.items():
        got = ds.sample_test_clip(t).frame_indices
        assert got == want, (t, got, want)


def test_clamped_dilation_first_frames(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "val")
    assert ds.sample_test_clip(0).frame_indices == [0]
    assert ds.sample_test_clip(2).frame_indices == [2]


def test_prototype_sampler(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "train_val_generate_prototype")
    assert len(ds) == 4  # train(2) + val(1) + test(1), with duplicates
    s = ds.sample_prototype_clip(0)
    assert len(s.frame_indices) == 10


def test_train_item_shapes_and_determinism(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "train", crop_size=(64, 64))
    a = ds.get_train_item(0, np.random.RandomState(7))
    b = ds.get_train_item(0, np.random.RandomState(7))
    assert a["imgs"].shape == (4, 64, 64, 3)
    assert a["labels"].shape == (4, 64, 64)
    assert a["labels"].dtype == np.int32
    np.testing.assert_array_equal(a["imgs"], b["imgs"])
    assert set(np.unique(a["labels"])) <= set(range(124)) | {255}


def test_test_item_aligned_to_32(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "val")
    item = ds.get_test_item(5)
    t, h, w, c = item["imgs"].shape
    assert t == 4 and c == 3
    assert h % 32 == 0 and w % 32 == 0
    assert item["ori_shape"] == (72, 96)


def test_train_loader_batches(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "train", crop_size=(64, 64))
    loader = TrainLoader(ds, batch_size=2, num_workers=2)
    it = iter(loader)
    batch = next(it)
    assert batch["imgs"].shape == (2, 4, 64, 64, 3)
    assert batch["labels"].shape == (2, 4, 64, 64)


def test_train_loader_process_mode_matches_threads(vspw_root):
    """worker_mode='process' (spawned workers + shared-memory transport, the
    reference DataLoader shape) must yield bit-identical batches to the
    thread path: the per-item RNG derives from (seed, epoch, index), so
    worker placement cannot change the stream."""
    ds = VSPWVideoDataset(vspw_root, "train", crop_size=(64, 64))
    def take(mode, n=2):
        it = iter(TrainLoader(ds, batch_size=2, num_workers=2, seed=3,
                              worker_mode=mode))
        return [next(it) for _ in range(n)]

    thr = take("thread")
    prc = take("process")
    for a, b in zip(thr, prc):
        np.testing.assert_array_equal(a["imgs"], b["imgs"])
        np.testing.assert_array_equal(a["labels"], b["labels"])
        assert a["videos"] == b["videos"]


def test_eval_iterator_covers_all_frames(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "val")
    items = list(iterate_eval(ds, num_workers=2))
    assert len(items) == 15


def test_aligned_resize_rescales_not_pads(rng):
    img = rng.randint(0, 255, (480, 853, 3)).astype(np.uint8)
    out, _ = T.aligned_resize_clip([img])
    assert out[0].shape == (480, 864, 3)


def test_crop_respects_cat_max_ratio(rng):
    # last-frame gt nearly uniform -> re-rolls happen but still yields a crop
    imgs = [rng.randint(0, 255, (100, 100, 3), np.uint8)] * 4
    segs = [np.zeros((100, 100), np.uint8)] * 4
    ci, cs = T.random_crop_clip(imgs, segs, np.random.RandomState(0), (64, 64))
    assert ci[0].shape == (64, 64, 3) and cs[0].shape == (64, 64)
