"""Slide / whole / TTA inference modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.eval.inference import slide_inference, tta_inference, whole_inference


def _fake_logits_fn(num_classes=4):
    """Downsample-by-4 'model': logits are channel-embedded input means."""

    def fn(imgs):  # (B, T, H, W, 3) -> (B, H/4, W/4, C)
        b, t, h, w, _ = imgs.shape
        pooled = imgs[:, -1].reshape(b, h // 4, 4, w // 4, 4, 3).mean(axis=(2, 4))
        base = pooled.sum(-1, keepdims=True)
        return jnp.concatenate([base * (i + 1) for i in range(num_classes)], axis=-1)

    return fn


def test_whole_inference_shapes(rng):
    imgs = jnp.asarray(rng.randn(1, 4, 32, 48, 3).astype(np.float32))
    prob = whole_inference(_fake_logits_fn(), imgs, (30, 45))
    assert prob.shape == (1, 30, 45, 4)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)


def test_slide_matches_whole_when_crop_covers(rng):
    imgs = jnp.asarray(rng.randn(1, 4, 32, 32, 3).astype(np.float32))
    fn = _fake_logits_fn()
    whole = whole_inference(fn, imgs, (32, 32))
    slide = slide_inference(fn, imgs, (32, 32), crop_size=(32, 32), stride=(32, 32))
    np.testing.assert_allclose(np.asarray(whole), np.asarray(slide), rtol=1e-4, atol=1e-5)


def test_slide_overlapping_windows(rng):
    imgs = jnp.asarray(rng.randn(1, 4, 48, 48, 3).astype(np.float32))
    prob = slide_inference(_fake_logits_fn(), imgs, (48, 48), crop_size=(32, 32),
                           stride=(16, 16))
    assert prob.shape == (1, 48, 48, 4)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)


def test_tta_flip_consistency(rng):
    """With a flip-equivariant model, flipped-view TTA must equal the plain
    prediction."""
    imgs = jnp.asarray(rng.randn(1, 4, 32, 32, 3).astype(np.float32))
    fn = _fake_logits_fn()
    plain = whole_inference(fn, imgs, (32, 32))
    tta = tta_inference(fn, [imgs, imgs], [False, True], (32, 32))
    np.testing.assert_allclose(np.asarray(tta), np.asarray(plain), rtol=1e-4, atol=1e-5)
