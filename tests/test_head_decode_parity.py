"""Merged embed+fuse decode vs the reference's explicit split computation.

Validates the algebraic identity used in ``_PerFrameDecoder``:
``Conv1x1(cat_i(resize_i(x_i @ A_i + b_i)))`` (reference
``cffm_head.py:105-119``) equals ``Σ_i resize_i(x_i @ (A_i F_i) + b_i F_i)``
including BN (frozen stats) + ReLU, computed here in torch f32.
"""

import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vss_cffm_tpu.models.heads import _PerFrameDecoder


def test_merged_fuse_matches_reference_split(rng):
    f = 32
    mod = _PerFrameDecoder(embed_dim=f)
    feats = [
        jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 4, 20).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 2, 24).astype(np.float32)),
    ]
    variables = mod.init(jax.random.PRNGKey(0), feats)
    # make BN stats non-trivial
    bn = variables["batch_stats"]["bn"]
    bn_mean = rng.randn(f).astype(np.float32) * 0.1
    bn_var = np.abs(rng.randn(f).astype(np.float32)) + 0.5
    variables = {
        "params": variables["params"],
        "batch_stats": {"bn": {"mean": jnp.asarray(bn_mean), "var": jnp.asarray(bn_var)}},
    }
    got = np.asarray(mod.apply(variables, feats, False))

    # --- torch reference computation (split form) -------------------------
    p = jax.tree.map(np.asarray, variables["params"])
    order = ["linear_c4", "linear_c3", "linear_c2", "linear_c1"]
    xs = [feats[3], feats[2], feats[1], feats[0]]
    parts = []
    for name, x in zip(order, xs):
        a = torch.from_numpy(p[name]["proj"]["kernel"])
        b = torch.from_numpy(p[name]["proj"]["bias"])
        y = torch.from_numpy(np.asarray(x)) @ a + b  # (B, h, w, f)
        y = y.permute(0, 3, 1, 2)
        if y.shape[2:] != (16, 16):
            y = F.interpolate(y, size=(16, 16), mode="bilinear", align_corners=False)
        parts.append(y)
    cat = torch.cat(parts, dim=1)  # (B, 4f, 16, 16)
    fuse = torch.from_numpy(p["fuse_kernel"])  # (4f, f)
    fused = torch.einsum("bchw,cf->bfhw", cat, fuse)
    scale = torch.from_numpy(np.asarray(variables["params"]["bn"]["scale"]))
    bias = torch.from_numpy(np.asarray(variables["params"]["bn"]["bias"]))
    normed = (fused - torch.from_numpy(bn_mean)[None, :, None, None]) / torch.sqrt(
        torch.from_numpy(bn_var)[None, :, None, None] + 1e-5
    )
    want = torch.relu(normed * scale[None, :, None, None] + bias[None, :, None, None])
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
