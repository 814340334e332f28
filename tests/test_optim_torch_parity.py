"""Full optimizer-chain parity vs torch.optim.AdamW.

Validates that our optax chain (scale_by_adam → add_decayed_weights →
lr-mult → schedule) reproduces mmcv/torch AdamW exactly, including the
decoupled weight decay being scaled by the *group* learning rate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from vss_cffm_tpu.train import OptimConfig, build_optimizer


def test_adamw_matches_torch_over_steps(rng):
    w_back = rng.randn(6, 4).astype(np.float32)
    w_head = rng.randn(3, 5).astype(np.float32)
    params = {"backbone": {"w": jnp.asarray(w_back)},
              "decode_head": {"w": jnp.asarray(w_head)}}
    cfg = OptimConfig(lr=1e-3, betas=(0.9, 0.999), weight_decay=0.01,
                      max_iters=1000, power=1.0, warmup_iters=0, warmup_ratio=1.0,
                      head_lr_mult=10.0)
    tx = build_optimizer(params, cfg)
    state = tx.init(params)

    tb = torch.nn.Parameter(torch.from_numpy(w_back.copy()))
    th = torch.nn.Parameter(torch.from_numpy(w_head.copy()))
    # two groups like mmcv's constructor: head gets lr×10
    def poly(step):
        return 1e-3 * (1 - step / 1000)

    opt = torch.optim.AdamW(
        [{"params": [tb], "lr": 1e-3},
         {"params": [th], "lr": 1e-2}],
        betas=(0.9, 0.999), weight_decay=0.01, eps=1e-8,
    )

    grads_seq = [
        {"backbone": {"w": jnp.asarray(rng.randn(6, 4).astype(np.float32))},
         "decode_head": {"w": jnp.asarray(rng.randn(3, 5).astype(np.float32))}}
        for _ in range(5)
    ]
    for step, grads in enumerate(grads_seq):
        updates, state = tx.update(grads, state, params)
        import optax
        params = optax.apply_updates(params, updates)

        lr = poly(step)
        for g, mult in ((opt.param_groups[0], 1.0), (opt.param_groups[1], 10.0)):
            g["lr"] = lr * mult
        tb.grad = torch.from_numpy(np.asarray(grads["backbone"]["w"]).copy())
        th.grad = torch.from_numpy(np.asarray(grads["decode_head"]["w"]).copy())
        opt.step()

    np.testing.assert_allclose(np.asarray(params["backbone"]["w"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["decode_head"]["w"]),
                               th.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_paramwise_first_match_mirrors_mmcv():
    """mmcv DefaultOptimizerConstructor first-match order [pos_block, head,
    norm]: decode-head norms/BN are DECAYED with lr×10; only backbone norms
    get decay 0 (ADVICE r1 medium finding)."""
    from vss_cffm_tpu.train.optim import paramwise_multipliers

    params = {
        "backbone": {
            "block1_0": {"norm1": {"scale": jnp.ones(2)},
                          "attn": {"q": {"kernel": jnp.ones((2, 2))}}},
            "norm1": {"bias": jnp.ones(2)},
        },
        "decode_head": {
            "decode": {"bn": {"scale": jnp.ones(2)}},
            "decoder_focal": {"blocks_0": {"norm1": {"scale": jnp.ones(2)}}},
            "linear_pred": {"kernel": jnp.ones((2, 2))},
        },
    }
    lr, wd = paramwise_multipliers(params, 10.0)
    assert lr["backbone"]["block1_0"]["norm1"]["scale"] == 1.0
    assert wd["backbone"]["block1_0"]["norm1"]["scale"] is False
    assert wd["backbone"]["norm1"]["bias"] is False
    assert wd["backbone"]["block1_0"]["attn"]["q"]["kernel"] is True
    # decode head: 'head' matches first → decayed, lr×10 (even norms/BN)
    assert lr["decode_head"]["decode"]["bn"]["scale"] == 10.0
    assert wd["decode_head"]["decode"]["bn"]["scale"] is True
    assert wd["decode_head"]["decoder_focal"]["blocks_0"]["norm1"]["scale"] is True
    assert lr["decode_head"]["linear_pred"]["kernel"] == 10.0
