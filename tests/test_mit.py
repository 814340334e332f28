"""MiT backbone: shape contracts + numerical parity with torch functional math.

The torch side of each parity test is straight-line functional code (conv /
layer_norm / softmax) driven by the flax module's own weights — it validates
that our NHWC/flax formulation computes exactly what the PyTorch layer stack
in the reference (``mmseg/models/backbones/mix_transformer.py``) would.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vss_cffm_tpu.models.mit import MIT_VARIANTS, MiT, MiTBlock, OverlapPatchEmbed, SRAttention


def t(x):
    return torch.from_numpy(np.asarray(x))


def dense_w(params, name):
    """flax Dense kernel (in,out) -> torch linear weight (out,in)."""
    return t(params[name]["kernel"]).T.contiguous(), t(params[name]["bias"]) if "bias" in params[name] else None


def conv_w(params, name):
    """flax Conv kernel (kh,kw,in/groups,out) -> torch conv weight (out,in/groups,kh,kw)."""
    k = t(params[name]["kernel"]).permute(3, 2, 0, 1).contiguous()
    return k, t(params[name]["bias"])


def torch_ln(x, params, name, eps):
    w, b = t(params[name]["scale"]), t(params[name]["bias"])
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


def test_patch_embed_parity(rng):
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    mod = OverlapPatchEmbed(embed_dim=32, patch_size=7, stride=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    k, b = conv_w(params, "proj")
    xt = t(x).permute(0, 3, 1, 2)
    out = F.conv2d(xt, k, b, stride=4, padding=3).permute(0, 2, 3, 1)
    out = torch_ln(out, params, "norm", 1e-5)
    np.testing.assert_allclose(got, out.numpy(), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sr", [1, 2])
def test_sra_attention_parity(rng, sr):
    b, h, w, c, heads = 2, 8, 8, 32, 2
    x = rng.randn(b, h, w, c).astype(np.float32)
    mod = SRAttention(dim=c, num_heads=heads, sr_ratio=sr)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    xt = t(x).reshape(b, h * w, c)
    qw, qb = dense_w(params, "q")
    q = F.linear(xt, qw, qb).reshape(b, -1, heads, c // heads).transpose(1, 2)
    if sr > 1:
        sk, sb = conv_w(params, "sr")
        red = F.conv2d(t(x).permute(0, 3, 1, 2), sk, sb, stride=sr)
        red = red.flatten(2).transpose(1, 2)  # B, N', C
        red = torch_ln(red, params, "norm", 1e-5)
    else:
        red = xt
    kvw, kvb = dense_w(params, "kv")
    kv = F.linear(red, kvw, kvb).reshape(b, -1, 2, heads, c // heads).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, h * w, c)
    pw, pb = dense_w(params, "proj")
    out = F.linear(out, pw, pb).reshape(b, h, w, c)
    np.testing.assert_allclose(got, out.numpy(), rtol=2e-5, atol=2e-5)


def test_block_parity(rng):
    """Full block: LN -> SRA -> residual -> LN -> MixFFN -> residual."""
    b, h, w, c = 1, 8, 8, 32
    x = rng.randn(b, h, w, c).astype(np.float32)
    mod = MiTBlock(dim=c, num_heads=2, sr_ratio=2, mlp_ratio=4, qkv_bias=True,
                   drop=0.0, attn_drop=0.0, drop_path_rate=0.1, norm_eps=1e-6)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), True))

    xt = t(x)
    h1 = torch_ln(xt, params, "norm1", 1e-6)
    # attention via the flax module itself (validated above)
    attn_out = SRAttention(dim=c, num_heads=2, sr_ratio=2).apply(
        {"params": params["attn"]}, jnp.asarray(np.asarray(h1))
    )
    xt = xt + t(np.asarray(attn_out))
    h2 = torch_ln(xt, params, "norm2", 1e-6)
    fw1, fb1 = dense_w(params["mlp"], "fc1")
    ff = F.linear(h2, fw1, fb1)
    dk, db = conv_w(params["mlp"], "dwconv")
    ff = F.conv2d(ff.permute(0, 3, 1, 2), dk, db, padding=1, groups=c * 4).permute(0, 2, 3, 1)
    ff = F.gelu(ff)
    fw2, fb2 = dense_w(params["mlp"], "fc2")
    ff = F.linear(ff, fw2, fb2)
    want = (xt + ff).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "k,s,hw", [(7, 4, (16, 16)), (3, 2, (16, 24)), (7, 4, (18, 22)), (3, 2, (15, 9))]
)
def test_im2col_embed_parity(rng, k, s, hw):
    """_Im2ColConv (conv-free strided slices + matmul) ≡ the strided conv.

    Same parameter tree, same math — checked against torch F.conv2d at the
    backbone's two (kernel, stride) geometries, incl. sizes that exercise
    the right/bottom block padding.
    """
    h, w = hw
    x = rng.randn(2, h, w, 5).astype(np.float32)
    mod = OverlapPatchEmbed(embed_dim=32, patch_size=k, stride=s, impl="im2col")
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    kk, b = conv_w(params, "proj")
    xt = t(x).permute(0, 3, 1, 2)
    out = F.conv2d(xt, kk, b, stride=s, padding=k // 2).permute(0, 2, 3, 1)
    out = torch_ln(out, params, "norm", 1e-5)
    assert got.shape == out.shape
    np.testing.assert_allclose(got, out.numpy(), rtol=2e-5, atol=2e-5)


def test_im2col_backbone_equivalence(rng):
    """Full MiT forward: im2col embeds ≡ conv embeds (same params)."""
    import dataclasses

    cfg = MIT_VARIANTS["mit_b0"]
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    conv_mod = MiT(cfg)
    params = conv_mod.init(jax.random.PRNGKey(0), x)["params"]
    want = conv_mod.apply({"params": params}, x)
    im2col_mod = MiT(dataclasses.replace(cfg, embed_impl="im2col"))
    got = im2col_mod.apply({"params": params}, x)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt), rtol=2e-5, atol=2e-5)


def test_im2col_embed_grad_parity(rng):
    """Autodiff through _Im2ColConv ≡ autodiff through the strided conv."""
    import jax

    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    conv = OverlapPatchEmbed(embed_dim=32, patch_size=7, stride=4)
    im2col = OverlapPatchEmbed(embed_dim=32, patch_size=7, stride=4, impl="im2col")
    params = conv.init(jax.random.PRNGKey(0), x)["params"]

    def loss(mod):
        return lambda p, x: jnp.sum(mod.apply({"params": p}, x) ** 2)

    g_ref = jax.grad(loss(conv), argnums=(0, 1))(params, x)
    g_got = jax.grad(loss(im2col), argnums=(0, 1))(params, x)
    for gg, gr in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["mit_b0", "mit_b1"])
def test_mit_feature_pyramid_shapes(variant):
    cfg = MIT_VARIANTS[variant]
    mod = MiT(cfg)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    feats = mod.apply({"params": params}, x)
    assert len(feats) == 4
    for i, f in enumerate(feats):
        stride = 4 * 2**i
        assert f.shape == (1, 64 // stride, 96 // stride, cfg.embed_dims[i])


def test_droppath_train_vs_eval():
    cfg = MIT_VARIANTS["mit_b0"]
    mod = MiT(cfg)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    # train mode requires a droppath rng and should still run
    out = mod.apply(
        {"params": params}, x, False,
        rngs={"droppath": jax.random.PRNGKey(3)},
    )
    assert out[0].shape == (2, 8, 8, cfg.embed_dims[0])
