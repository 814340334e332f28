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
