"""Device-side normalization: uint8 batches must train identically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.data.transforms import IMG_MEAN, IMG_STD, normalize_clip
from vss_cffm_tpu.train import OptimConfig, TrainState, build_optimizer, make_train_step
from vss_cffm_tpu.train.step import device_normalize
from test_heads_segmentor import tiny_segmentor


def test_device_normalize_matches_host(rng):
    u8 = rng.randint(0, 255, (2, 4, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(device_normalize(jnp.asarray(u8)))
    want = np.stack([np.stack(normalize_clip(list(clip))) for clip in u8])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_train_step_uint8_matches_f32(rng):
    model = tiny_segmentor()
    u8 = rng.randint(0, 255, (2, 4, 64, 64, 3)).astype(np.uint8)
    labels = rng.randint(0, 5, (2, 4, 64, 64)).astype(np.int32)
    f32 = np.stack([np.stack(normalize_clip(list(clip))) for clip in u8]).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(f32[:1]))
    tx = build_optimizer(variables["params"], OptimConfig(lr=1e-3, warmup_iters=0,
                                                          warmup_ratio=1.0, max_iters=100))
    step = make_train_step(model, tx, donate=False)
    state = TrainState.create(variables, tx)

    _, m_f32 = step(state, {"imgs": jnp.asarray(f32), "labels": jnp.asarray(labels)},
                    jax.random.PRNGKey(1))
    _, m_u8 = step(state, {"imgs": jnp.asarray(u8), "labels": jnp.asarray(labels)},
                   jax.random.PRNGKey(1))
    assert float(m_u8["loss_seg"]) == pytest.approx(float(m_f32["loss_seg"]), rel=1e-5)
