"""Streaming evaluator must reproduce the plain clip evaluator exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_fake_vspw
from vss_cffm_tpu.data import VSPWVideoDataset, iterate_eval
from vss_cffm_tpu.eval import ClipEvaluator
from vss_cffm_tpu.eval.evaluator import StreamingVideoEvaluator
from test_heads_segmentor import tiny_segmentor


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    return make_fake_vspw(str(tmp_path_factory.mktemp("vspw")), hw=(64, 96),
                          num_classes=5)


def test_streaming_matches_plain_eval(vspw_root):
    model = tiny_segmentor()
    ds = VSPWVideoDataset(vspw_root, "val")
    x = jnp.zeros((1, 4, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    plain = ClipEvaluator(model, variables["params"], variables["batch_stats"], 5)
    plain_out = plain.run(iterate_eval(ds, num_workers=2), dataset=ds)

    stream = StreamingVideoEvaluator(model, variables["params"],
                                     variables["batch_stats"], 5)
    stream_out = stream.run_streaming(ds)

    np.testing.assert_array_equal(np.asarray(plain.confusion), np.asarray(stream.confusion))
    assert plain_out["mIoU"] == pytest.approx(stream_out["mIoU"], nan_ok=True)
