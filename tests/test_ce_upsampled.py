"""Fused CE-on-upsampled-logits kernels (interpret) vs the XLA formulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vss_cffm_tpu.models.losses as losses
import vss_cffm_tpu.ops.ce_upsampled as ce


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(ce, "_INTERPRET", True)


def test_phase_layout_roundtrip(rng):
    x = jnp.asarray(rng.randint(0, 99, (2, 24, 32)).astype(np.int32))
    assert np.array_equal(
        np.asarray(ce.phase_to_natural(ce.labels_to_phase(x, 4), 4)), np.asarray(x)
    )


def test_fwd_matches_xla(rng):
    n, h, w, c, s = 2, 8, 12, 30, 4
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (n, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.1] = 255
    lph = ce.labels_to_phase(jnp.asarray(labels), s)
    nll_ref, pred_ref = ce.ce_upsampled_nll_xla(logits, lph, s)
    nll, pred = ce.ce_upsampled_nll(logits, lph, s)
    np.testing.assert_allclose(np.asarray(nll), np.asarray(nll_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred_ref))


def test_bwd_matches_xla_grad(rng):
    n, h, w, c, s = 1, 8, 8, 17, 2
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (n, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.1] = 255
    lph = ce.labels_to_phase(jnp.asarray(labels), s)
    valid = (lph != 255).astype(jnp.float32)
    wgt = jnp.asarray(rng.rand(*lph.shape).astype(np.float32))

    def lk(x):
        nll, _ = ce.ce_upsampled_nll(x, lph, s)
        return jnp.mean(nll * valid * wgt)

    def lx(x):
        nll, _ = ce.ce_upsampled_nll_xla(x, lph, s)
        return jnp.mean(nll * valid * wgt)

    gk = jax.grad(lk)(logits)
    gx = jax.grad(lx)(logits)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), rtol=2e-4, atol=2e-6)


def test_fused_clip_loss_matches_fallback(rng, monkeypatch):
    b, t, h, w, c, s = 1, 4, 8, 8, 19, 4
    logits = jnp.asarray(rng.randn(b, t + 1, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (b, t, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.15] = 255
    labels = jnp.asarray(labels)

    monkeypatch.setattr(losses, "_FORCE_FUSED", True)
    got = losses.clip_ce_loss(logits, labels)
    gg = jax.grad(lambda x: losses.clip_ce_loss(x, labels)["loss_seg"])(logits)
    monkeypatch.setattr(losses, "_FORCE_FUSED", False)
    want = losses.clip_ce_loss(logits, labels)
    gw = jax.grad(lambda x: losses.clip_ce_loss(x, labels)["loss_seg"])(logits)

    np.testing.assert_allclose(float(got["loss_seg"]), float(want["loss_seg"]), rtol=2e-5)
    np.testing.assert_allclose(float(got["acc_seg"]), float(want["acc_seg"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), rtol=2e-4, atol=1e-7)


def test_fused_city_loss_matches_fallback(rng, monkeypatch):
    b, t, h, w, c, s = 1, 4, 8, 8, 19, 4
    logits = jnp.asarray(rng.randn(b, t + 1, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (b, t, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.15] = 255
    labels = jnp.asarray(labels)

    monkeypatch.setattr(losses, "_FORCE_FUSED", True)
    got = losses.clip_ce_loss_city(logits, labels)
    monkeypatch.setattr(losses, "_FORCE_FUSED", False)
    want = losses.clip_ce_loss_city(logits, labels)
    np.testing.assert_allclose(float(got["loss_seg"]), float(want["loss_seg"]), rtol=2e-5)
    np.testing.assert_allclose(float(got["acc_seg"]), float(want["acc_seg"]), rtol=1e-6)


def test_fused_clip_loss_class_weight_and_ohem_match_fallback(rng, monkeypatch):
    """The config-reachable loss options (class_weight, OHEM, loss_weight)
    must agree between the fused kernel path and the XLA resize path."""
    b, t, h, w, c, s = 1, 4, 8, 8, 19, 4
    logits = jnp.asarray(rng.randn(b, t + 1, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (b, t, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.15] = 255
    labels = jnp.asarray(labels)
    cw = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    kwargs = dict(class_weight=cw, loss_weight=0.7,
                  use_ohem=True, ohem_cfg={"thresh": 0.9, "min_kept": 50})

    monkeypatch.setattr(losses, "_FORCE_FUSED", True)
    got = losses.clip_ce_loss(logits, labels, **kwargs)
    gg = jax.grad(lambda x: losses.clip_ce_loss(x, labels, **kwargs)["loss_seg"])(logits)
    monkeypatch.setattr(losses, "_FORCE_FUSED", False)
    want = losses.clip_ce_loss(logits, labels, **kwargs)
    gw = jax.grad(lambda x: losses.clip_ce_loss(x, labels, **kwargs)["loss_seg"])(logits)

    np.testing.assert_allclose(float(got["loss_seg"]), float(want["loss_seg"]), rtol=2e-5)
    np.testing.assert_allclose(float(got["acc_seg"]), float(want["acc_seg"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), rtol=3e-4, atol=1e-7)


def test_loss_v2_fwd_matches_xla(rng):
    n, h, w, c, s = 2, 8, 12, 30, 4
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (n, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.1] = 255
    lph = ce.labels_to_phase(jnp.asarray(labels), s)
    w_img = 0.5 / labels.size
    ws_ref, corr_ref = ce.ce_upsampled_loss_xla(logits, lph, s, w_img)
    ws, corr = ce.ce_upsampled_loss(logits, lph, s, w_img)
    np.testing.assert_allclose(float(ws), float(ws_ref), rtol=2e-5)
    np.testing.assert_allclose(float(corr), float(corr_ref), rtol=0)


def test_loss_v2_grad_matches_xla(rng):
    n, h, w, c, s = 1, 8, 8, 17, 2
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, (n, h * s, w * s)).astype(np.int32)
    labels[rng.rand(*labels.shape) < 0.1] = 255
    lph = ce.labels_to_phase(jnp.asarray(labels), s)
    w_img = 1.0 / labels.size

    gk = jax.grad(lambda x: ce.ce_upsampled_loss(x, lph, s, w_img)[0] * 3.0)(logits)
    gx = jax.grad(lambda x: ce.ce_upsampled_loss_xla(x, lph, s, w_img)[0] * 3.0)(logits)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), rtol=2e-4, atol=1e-8)


def test_loss_v2_all_ignored(rng):
    """A fully-ignored label map must give zero loss, zero correct, zero grad."""
    n, h, w, c, s = 1, 8, 8, 11, 4
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    labels = np.full((n, h * s, w * s), 255, np.int32)
    lph = ce.labels_to_phase(jnp.asarray(labels), s)
    ws, corr = ce.ce_upsampled_loss(logits, lph, s, 1.0 / labels.size)
    assert float(ws) == 0.0 and float(corr) == 0.0
    g = jax.grad(lambda x: ce.ce_upsampled_loss(x, lph, s, 1.0 / labels.size)[0])(logits)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
