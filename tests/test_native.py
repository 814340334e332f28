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


def test_bgr2hsv_exhaustive():
    """cv2-exact 8U BGR→HSV over ALL 2^24 inputs (fixed-point div tables)."""
    v = np.arange(1 << 24, dtype=np.uint32)
    img = np.stack([v & 255, (v >> 8) & 255, (v >> 16) & 255],
                   -1).astype(np.uint8).reshape(4096, 4096, 3)
    np.testing.assert_array_equal(native.cvt_hsv(img),
                                  cv2.cvtColor(img, cv2.COLOR_BGR2HSV))


@pytest.mark.parametrize("width", [256, 31, 53])
def test_hsv2bgr_exhaustive(width):
    """cv2-exact 8U HSV→BGR over the full (180, 256, 256) grid, in several
    row widths: cv2 truncates in its 32-px SIMD blocks but cvRounds in the
    scalar row tail, so width exercises the dispatch split (256 = all
    vector, 31 = all scalar, 53 = 32+21 mixed like a real crop row)."""
    h = np.repeat(np.arange(180, dtype=np.uint8), 256 * 256)
    s = np.tile(np.repeat(np.arange(256, dtype=np.uint8), 256), 180)
    v = np.tile(np.arange(256, dtype=np.uint8), 180 * 256)
    hsv = np.stack([h, s, v], -1)
    pad = (-len(hsv)) % width
    grid = np.concatenate([hsv, hsv[:pad]]).reshape(-1, width, 3)
    np.testing.assert_array_equal(native.cvt_hsv(grid, inverse=True),
                                  cv2.cvtColor(grid, cv2.COLOR_HSV2BGR))


def test_pmd_native_bitwise_vs_python(rng):
    """Native fused PhotoMetricDistortion == the cv2/numpy pipeline, with
    draw_pmd_params consuming the exact same RNG stream."""
    from vss_cffm_tpu.data import transforms as T

    for seed in range(60):
        h, w = [(37, 53), (16, 32), (21, 95), (7, 31), (48, 480)][seed % 5]
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        r1 = np.random.RandomState(seed)
        r2 = np.random.RandomState(seed)
        want = T.photometric_distortion_clip([img.copy()], r1)[0]
        got = native.pmd_apply(np.ascontiguousarray(img.copy()),
                               T.draw_pmd_params(r2))
        assert r1.randint(1 << 30) == r2.randint(1 << 30)  # same draws
        np.testing.assert_array_equal(got, want)


def test_label_window_bitwise_vs_cv2(rng):
    """cv2-exact INTER_NEAREST window resize (+flip, +row bands)."""
    for _ in range(25):
        sh, sw = rng.randint(40, 900), rng.randint(40, 900)
        seg = rng.randint(0, 125, (sh, sw)).astype(np.uint8)
        f = rng.uniform(0.3, 2.5)
        rh, rw = max(1, int(sh * f + 0.5)), max(1, int(sw * f + 0.5))
        ref_full = cv2.resize(seg, (rw, rh), interpolation=cv2.INTER_NEAREST)
        y1, x1 = rng.randint(0, rh), rng.randint(0, rw)
        vh, vw = rng.randint(1, rh - y1 + 1), rng.randint(1, rw - x1 + 1)
        flip = bool(rng.randint(2))
        want = ref_full[y1:y1 + vh, x1:x1 + vw]
        if flip:
            want = want[:, ::-1]
        got = native.label_window(seg, rh, rw, y1, x1, vh, vw, flip)
        np.testing.assert_array_equal(got, want)
        # band variant: only the touched source rows are supplied
        lo, hi = native.label_window_rows(sh, rh, y1, vh)
        got_band = native.label_window(seg[lo:hi + 1], rh, rw, y1, x1, vh,
                                       vw, flip, src_row0=lo, sh=sh)
        np.testing.assert_array_equal(got_band, want)


def test_decode_label_band_vs_full(rng, tmp_path):
    """Band-limited PNG label decode == full decode + LUT on those rows."""
    import io

    from PIL import Image

    from vss_cffm_tpu.data.vspw import _LUT_REDUCE

    for trial in range(8):
        h, w = rng.randint(30, 400), rng.randint(30, 400)
        seg = rng.randint(0, 125, (h, w)).astype(np.uint8)
        img = Image.fromarray(seg, mode="L")
        if trial % 2:
            img = img.convert("P")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        data = buf.getvalue()
        assert native.png_dims(data) == (h, w)
        r0 = rng.randint(0, h)
        r1 = rng.randint(r0, h)
        band = native.decode_label_band(data, _LUT_REDUCE, r0, r1)
        assert band is not None
        np.testing.assert_array_equal(band, _LUT_REDUCE[seg][r0:r1 + 1])


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
