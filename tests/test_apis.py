"""Inference API end-to-end smoke (the reference's one e2e test is
``test_inference.py`` running init+inference on a demo image — same here,
on the clip path with a tiny model)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from vss_cffm_tpu.apis import SegmentorBundle, inference_segmentor, show_result
from vss_cffm_tpu.config import DataConfig, ExperimentConfig
from test_heads_segmentor import tiny_segmentor

import jax


def _bundle():
    model = tiny_segmentor()
    cfg = ExperimentConfig(
        model=model.config,
        data=DataConfig(crop_size=(64, 64), img_scale=(96, 64)),
    )
    x = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return SegmentorBundle(model, variables["params"], variables["batch_stats"], cfg)


def test_inference_segmentor_clip(rng):
    bundle = _bundle()
    frames = [rng.randint(0, 255, (60, 90, 3)).astype(np.uint8) for _ in range(4)]
    seg = inference_segmentor(bundle, frames)
    assert seg.shape == (60, 90)
    assert seg.dtype.kind in "iu"
    assert seg.max() < 5


def test_inference_segmentor_single_image(rng):
    bundle = _bundle()
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    seg = inference_segmentor(bundle, img)  # T=1 -> head fallback path
    assert seg.shape == (60, 90)


def test_image_mode_inference(rng):
    """Single-frame SegFormer through the same API (arch='image')."""
    import dataclasses as dc
    from vss_cffm_tpu.apis import init_segmentor
    from vss_cffm_tpu.models.mit import MIT_VARIANTS
    from vss_cffm_tpu.models.segmentor import SegmentorConfig
    from test_heads_segmentor import TINY_HEAD

    cfg = ExperimentConfig(
        model=SegmentorConfig(
            backbone="mit_b0",
            head=dc.replace(TINY_HEAD, in_channels=tuple(MIT_VARIANTS["mit_b0"].embed_dims)),
            arch="image",
        ),
        data=DataConfig(crop_size=(64, 64), img_scale=(96, 64)),
    )
    bundle = init_segmentor(cfg, None, dtype=jnp.float32)
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    seg = inference_segmentor(bundle, img)
    assert seg.shape == (60, 90)


def test_show_result_overlay(rng):
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    seg = rng.randint(0, 5, (32, 32))
    out = show_result(img, seg)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
