"""Clip frame parallelism over a 2-D (data, frames) mesh.

Shards the clip's T axis across devices: the backbone runs each frame on
its own device; GSPMD all-gathers the fused features where the CFFM block
needs cross-frame context. Outputs must match unsharded execution, and the
full data+frame-parallel *training* step must also run and agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vss_cffm_tpu.parallel import create_clip_mesh, replicate, shard_clip_batch
from vss_cffm_tpu.train import OptimConfig, TrainState, build_optimizer, make_train_step
from test_heads_segmentor import tiny_segmentor


def test_frame_parallel_inference_matches_single_device(rng):
    assert len(jax.devices()) == 8
    mesh = create_clip_mesh(jax.devices()[:4], frame_axis=4)
    model = tiny_segmentor()
    imgs = jnp.asarray(rng.randn(1, 4, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)

    plain = np.asarray(model.apply(variables, imgs, False))

    with mesh:
        v_rep = replicate(variables, mesh)
        imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P(None, "frames")))
        out = jax.jit(lambda v, x: model.apply(v, x, False))(v_rep, imgs_sh)
    np.testing.assert_allclose(np.asarray(out), plain, rtol=2e-4, atol=2e-4)


def test_data_plus_frame_parallel_train_step(rng):
    mesh = create_clip_mesh(jax.devices(), frame_axis=4)  # (2, 4) mesh
    assert mesh.shape == {"data": 2, "frames": 4}
    model = tiny_segmentor()
    batch = {
        "imgs": jnp.asarray(rng.randn(2, 4, 64, 64, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 5, (2, 4, 64, 64)).astype(np.int32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["imgs"][:1])
    tx = build_optimizer(variables["params"], OptimConfig(lr=1e-3, warmup_iters=0,
                                                          warmup_ratio=1.0, max_iters=100))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)

    # unsharded reference
    _, m_ref = step(state, batch, jax.random.PRNGKey(0))

    state_sh = replicate(state, mesh)
    sharded = shard_clip_batch(batch, mesh)
    _, m_sh = step(state_sh, sharded, jax.random.PRNGKey(0))
    assert float(m_sh["loss_seg"]) == pytest.approx(float(m_ref["loss_seg"]), rel=1e-4)
