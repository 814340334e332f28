"""Parity of ops.resize with torch.nn.functional.interpolate (CPU torch)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vss_cffm_tpu.ops import resize_bilinear, resize_nearest


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((15, 27), (120, 120)),  # upsample (head: 1/32 -> 1/4)
        ((120, 120), (60, 60)),  # downsample (head: 1/4 -> 1/8)
        ((60, 108), (63, 112)),  # odd sizes
        ((63, 63), (54, 54)),    # CFFA clip pooling resize
        ((120, 216), (480, 853)),  # loss/eval upsample, non-divisible
        ((7, 7), (7, 7)),        # identity
    ],
)
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
    want = want.permute(0, 2, 3, 1).numpy()
    # torch CPU computes source coordinates in f32; we use f64 — allow the
    # resulting ~1e-4 weight-precision noise.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_nearest_matches_torch(rng):
    x = rng.randn(1, 31, 45, 2).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (64, 128)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=(64, 128), mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_bilinear_preserves_constant(rng):
    x = np.full((1, 9, 13, 1), 3.25, np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(x), (17, 5)))
    np.testing.assert_allclose(out, 3.25, rtol=1e-6)
