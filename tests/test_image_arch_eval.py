"""Single-frame (image-arch) segmentor through the clip evaluator."""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_fake_vspw
from vss_cffm_tpu.data import VSPWVideoDataset, iterate_eval
from vss_cffm_tpu.eval import ClipEvaluator
from vss_cffm_tpu.models.mit import MIT_VARIANTS
from vss_cffm_tpu.models.segmentor import SegmentorConfig, build_segmentor
from test_heads_segmentor import TINY_HEAD


def test_image_arch_eval(tmp_path):
    root = make_fake_vspw(str(tmp_path), hw=(64, 96), num_classes=5)
    cfg = SegmentorConfig(
        backbone="mit_b0",
        head=dc.replace(TINY_HEAD, in_channels=tuple(MIT_VARIANTS["mit_b0"].embed_dims)),
        arch="image",
    )
    model = build_segmentor(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    ds = VSPWVideoDataset(root, "val", img_scale=(96, 64))
    ev = ClipEvaluator(model, variables["params"], variables["batch_stats"], 5)
    out = ev.run(iterate_eval(ds, num_workers=2), dataset=ds)
    assert 0.0 <= out["aAcc"] <= 1.0
