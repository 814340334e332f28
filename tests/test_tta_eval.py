"""Multi-scale flip TTA eval path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_fake_vspw
from vss_cffm_tpu.data import VSPWVideoDataset
from vss_cffm_tpu.eval import ClipEvaluator
from test_heads_segmentor import tiny_segmentor


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    return make_fake_vspw(str(tmp_path_factory.mktemp("vspw")), hw=(64, 96),
                          num_classes=5)


def test_tta_item_and_predict(vspw_root):
    ds = VSPWVideoDataset(vspw_root, "val", img_scale=(96, 64))
    item = ds.get_test_item_tta(5, ratios=(1.0, 1.5), flip=True)
    assert len(item["views"]) == 4
    assert item["flips"] == [False, True, False, True]
    assert item["views"][0].shape[0] == 4  # clip length

    model = tiny_segmentor()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 96, 3)))
    ev = ClipEvaluator(model, variables["params"], variables["batch_stats"], 5)
    pred = ev.predict_tta(item)
    assert pred.shape == tuple(item["ori_shape"])
    assert pred.max() < 5
