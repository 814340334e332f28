"""Gradient checkpointing (nn.remat) path of the CFFM decoder.

The reference plumbs ``use_checkpoint`` but never enables it
(``cffm_head.py:93``); here the remat path must actually train.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vss_cffm_tpu.models.cffm_transformer import CFFMDecoder, CFFMDecoderConfig


def test_remat_decoder_forward_and_grad(rng):
    cfg = CFFMDecoderConfig(dim=16, depth=2, num_heads=2, use_checkpoint=True)
    x = jnp.asarray(rng.randn(1, 4, 14, 14, 16).astype(np.float32))
    mod = CFFMDecoder(cfg)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    # forward identical to the non-remat stack
    plain = CFFMDecoder(CFFMDecoderConfig(dim=16, depth=2, num_heads=2))
    out_remat = mod.apply({"params": params}, x)
    out_plain = plain.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_remat), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)

    # gradients flow (training mode exercises the remat-wrapped blocks)
    def loss(p):
        out = mod.apply({"params": p}, x, False,
                        rngs={"droppath": jax.random.PRNGKey(1)})
        return (out ** 2).mean()

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
