"""Head and segmentor forward contracts (tiny shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.models import (
    CFFMHeadConfig,
    CFFMSegmentor,
    ImageSegmentor,
    SegmentorConfig,
    build_model_config,
)
from vss_cffm_tpu.models.cffm_transformer import CFFMDecoderConfig

TINY_HEAD = CFFMHeadConfig(
    in_channels=(8, 16, 24, 32),
    embed_dim=32,
    num_classes=5,
    num_clips=4,
    decoder=CFFMDecoderConfig(dim=32, depth=1, num_heads=2),
)


def tiny_segmentor(mode="cffm"):
    from vss_cffm_tpu.models.mit import MiTConfig, MIT_VARIANTS
    import dataclasses

    cfg = SegmentorConfig(
        backbone="mit_b0",
        head=dataclasses.replace(
            TINY_HEAD,
            in_channels=tuple(MIT_VARIANTS["mit_b0"].embed_dims),
            mode=mode,
        ),
    )
    return CFFMSegmentor(cfg)


def _clip(rng, b=1, t=4, h=64, w=64):
    return jnp.asarray(rng.randn(b, t, h, w, 3).astype(np.float32))


def test_cffm_train_output_shape(rng):
    model = tiny_segmentor()
    x = _clip(rng)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(
        variables, x, True,
        rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    # (B, T+1, h/4, w/4, num_classes)
    assert out.shape == (1, 5, 16, 16, 5)
    assert "batch_stats" in mutated


def test_cffm_eval_output_shape(rng):
    model = tiny_segmentor()
    x = _clip(rng)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 16, 16, 5)


def test_cffm_eval_fallback_wrong_num_clips(rng):
    """num_clips != train num_clips -> plain per-frame logits of last frame
    (reference ``cffm_head.py:127-129``)."""
    model = tiny_segmentor()
    x4 = _clip(rng)
    variables = model.init(jax.random.PRNGKey(0), x4)
    out = model.apply(variables, _clip(rng, t=2), False)
    assert out.shape == (1, 16, 16, 5)


def test_finetune_mode_with_centers(rng):
    model = tiny_segmentor(mode="finetune")
    x = _clip(rng)
    centers = jnp.asarray(rng.randn(1, 10, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, cluster_centers=centers)
    out = model.apply(variables, x, False, centers)
    assert out.shape == (1, 16, 16, 5)
    # train: x3 branch appended -> T+1 maps
    out_t, _ = model.apply(
        variables, x, True, centers,
        rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out_t.shape == (1, 5, 16, 16, 5)


def test_finetune_gradients_only_cluster_branch(rng):
    """stop_gradient parity with detach/freeze (``cffm_head.py:478-518``)."""
    model = tiny_segmentor(mode="finetune")
    x = _clip(rng)
    centers = jnp.asarray(rng.randn(1, 10, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, cluster_centers=centers)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, centers,
            rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return (out[:, -1] ** 2).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {jax.tree_util.keystr(p) for p, g in leaves if np.abs(np.asarray(g)).max() > 0}
    assert any("decoder_swin" in k for k in nonzero)
    assert any("linear_pred3" in k for k in nonzero)
    assert not any("decoder_focal" in k for k in nonzero)
    assert not any("backbone" in k for k in nonzero)


def test_prototype_features(rng):
    model = tiny_segmentor()
    x = _clip(rng, t=3)
    variables = model.init(jax.random.PRNGKey(0), _clip(rng))
    feats = model.apply(variables, x, method=model.prototype_features)
    assert feats.shape == (1, 3, 8, 8, 32)


def test_image_segmentor(rng):
    import dataclasses
    from vss_cffm_tpu.models.mit import MIT_VARIANTS

    cfg = SegmentorConfig(
        backbone="mit_b0",
        head=dataclasses.replace(TINY_HEAD, in_channels=tuple(MIT_VARIANTS["mit_b0"].embed_dims)),
    )
    model = ImageSegmentor(cfg)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 16, 16, 5)


def test_build_model_config_variants():
    for v, depth in [("b0", 1), ("b1", 2), ("b2", 2), ("b5", 4)]:
        cfg = build_model_config(v)
        assert cfg.head.decoder.depth == depth
        assert cfg.head.num_classes == 124


def test_cluster_decoder_padded_mask_equals_subset(rng):
    """Masked softmax over padded centres ≡ attention over the valid subset
    (the reference uses variable-count centres as-is, ``cffm_head.py:444-452``)."""
    from vss_cffm_tpu.models.cluster_head import ClusterDecoder

    mod = ClusterDecoder(dim=16, num_heads=2)
    x = jnp.asarray(rng.randn(1, 4, 4, 16), jnp.float32)
    centers = jnp.asarray(rng.randn(1, 9, 16), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, centers)["params"]

    padded = jnp.concatenate(
        [centers, jnp.asarray(rng.randn(1, 3, 16), jnp.float32)], axis=1
    )
    mask = jnp.asarray([[True] * 9 + [False] * 3])
    out_subset = mod.apply({"params": params}, x, centers)
    out_masked = mod.apply({"params": params}, x, (padded, mask))
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_subset), rtol=1e-5, atol=1e-5
    )
