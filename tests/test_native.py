"""Native C++ data path vs cv2/numpy reference."""

import cv2
import numpy as np
import pytest

from vss_cffm_tpu import native
from vss_cffm_tpu.data.transforms import IMG_MEAN, IMG_STD

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no toolchain)")


def _jpeg_bytes(rng, h=48, w=64):
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    return bytes(buf.tobytes())


def test_decode_matches_cv2(rng):
    data = _jpeg_bytes(rng)
    got = native.decode_jpeg(data)
    want = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert got.shape == want.shape
    # JPEG decoders may differ by ±1-2 LSB in IDCT rounding
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 3
    assert (diff > 1).mean() < 0.02


def test_normalize_matches_numpy(rng):
    img = rng.randint(0, 255, (32, 40, 3)).astype(np.uint8)
    got = native.normalize_f32(img, IMG_MEAN, IMG_STD, to_rgb=True)
    want = (img[..., ::-1].astype(np.float32) - IMG_MEAN) / IMG_STD
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_clip_decode_threaded(rng):
    bufs = [_jpeg_bytes(rng) for _ in range(4)]
    out = native.decode_clip_normalized(bufs, 48, 64, IMG_MEAN, IMG_STD, n_threads=4)
    assert out.shape == (4, 48, 64, 3)
    for i, b in enumerate(bufs):
        single = native.normalize_f32(native.decode_jpeg(b), IMG_MEAN, IMG_STD)
        np.testing.assert_allclose(out[i], single, atol=1e-5)


def test_dims_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg")


def test_resize_window_bitwise_vs_cv2(rng):
    """cv2-exact fixed-point bilinear: random geometries incl. >2x upscales
    (whose border rows need the unclamped-beta rule) must match bitwise."""
    for _ in range(12):
        sh, sw = rng.randint(5, 300), rng.randint(5, 400)
        f = rng.uniform(0.3, 2.5)
        rh, rw = max(1, int(sh * f + 0.5)), max(1, int(sw * f + 0.5))
        src = rng.randint(0, 256, (sh, sw, 3)).astype(np.uint8)
        ref = cv2.resize(src, (rw, rh), interpolation=cv2.INTER_LINEAR)
        y1 = rng.randint(0, max(rh - 64, 0) + 1)
        x1 = rng.randint(0, max(rw - 64, 0) + 1)
        vh, vw = min(64, rh - y1), min(64, rw - x1)
        got = native.resize_window(src, rh, rw, y1, x1, vh, vw)
        np.testing.assert_array_equal(got, ref[y1:y1 + vh, x1:x1 + vw])


def test_resize_window_flip(rng):
    src = rng.randint(0, 256, (40, 50, 3)).astype(np.uint8)
    ref = cv2.resize(src, (75, 60), interpolation=cv2.INTER_LINEAR)
    got = native.resize_window(src, 60, 75, 10, 5, 32, 48, flip=True)
    np.testing.assert_array_equal(got, ref[10:42, 5:53][:, ::-1])


def test_native_train_item_bitwise_vs_numpy_path(tmp_path, rng):
    """The fused-native get_train_item must be bit-identical to the numpy
    transform pipeline (same decoder, same RNG draw order, cv2-bitwise
    window resize, shared PMD code)."""
    from fixtures import make_fake_vspw
    from vss_cffm_tpu.data.vspw import VSPWVideoDataset

    root = make_fake_vspw(str(tmp_path), frames_per_video=12, hw=(60, 80))
    ds = VSPWVideoDataset(root, "train", crop_size=(48, 48), img_scale=(96, 54))
    for idx in range(len(ds)):
        for seed in (0, 1, 2):
            r1 = np.random.RandomState(seed)
            r2 = np.random.RandomState(seed)
            got = ds._train_item_native(*ds.sample_train_clip(idx, r1), r1, False)
            assert got is not None
            # numpy path, same draws (re-sample the clip with the twin rng)
            import vss_cffm_tpu.data.vspw as vspw_mod
            sample, frames = ds.sample_train_clip(idx, r2)
            imgs, segs = ds._load_frames(sample.video, frames, sample.frame_indices, True)
            from vss_cffm_tpu.data import transforms as T
            imgs, segs = T.random_scale_clip(imgs, segs, r2, ds.img_scale)
            imgs, segs = T.random_crop_clip(imgs, segs, r2, ds.crop_size)
            imgs, segs, _ = T.random_flip_clip(imgs, segs, r2)
            imgs = T.photometric_distortion_clip(imgs, r2)
            imgs, segs = T.pad_clip(imgs, segs, ds.crop_size)
            np.testing.assert_array_equal(got["imgs"], np.stack(imgs))
            np.testing.assert_array_equal(got["labels"], np.stack(segs).astype(np.int32))
