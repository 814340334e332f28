"""Fully-fused MiT block kernel (interpret) vs the XLA oracle and the module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.ops.stage_block import mit_block_fused, mit_block_xla


def _block_params(rng, c, ch):
    g = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    return dict(
        g1=jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32)),
        be1=g(c),
        wq=g(c, c), bq=g(c),
        wproj=g(c, c), bproj=g(c),
        g2=jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32)),
        be2=g(c),
        w1=g(c, ch), b1=g(ch),
        kdw=jnp.asarray(rng.randn(3, 3, 1, ch).astype(np.float32) * 0.2),
        bdw=g(ch),
        w2=g(ch, c), b2=g(c),
    )


@pytest.mark.parametrize("shape,ch,s,nh", [
    ((2, 12, 12, 64), 256, 4, 1),    # stage-1-like (row tiling, wide W pad)
    ((1, 9, 11, 32), 128, 6, 1),     # odd H/W: halo masking + alignment pad
    ((1, 16, 14, 64), 256, 9, 2),    # multi-row-tile + 2-head loop
    ((1, 8, 8, 80), 320, 16, 5),     # stage-3-like 5-head geometry
])
def test_fused_matches_xla(rng, shape, ch, s, nh):
    b, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, c).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.randn(b, s, c).astype(np.float32) * 0.2)
    p = _block_params(rng, c, ch)
    got = mit_block_fused(
        x, p["g1"], p["be1"], p["wq"], p["bq"], k, v, p["wproj"], p["bproj"],
        p["g2"], p["be2"], p["w1"], p["b1"], p["kdw"], p["bdw"], p["w2"],
        p["b2"], num_heads=nh, eps=1e-6, interpret=True)
    want = mit_block_xla(
        x, p["g1"], p["be1"], p["wq"], p["bq"], k, v, p["wproj"], p["bproj"],
        p["g2"], p["be2"], p["w1"], p["b1"], p["kdw"], p["bdw"], p["w2"],
        p["b2"], num_heads=nh, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fused_block_matches_module(rng):
    """MiTBlock(block_impl='fused-interpret') ≡ the composed block on the
    same params (f32) — proves the megakernel plumbing (kv_only SRAttention,
    params_only MixFFN, LN holders) is invisible to checkpoints and math."""
    from vss_cffm_tpu.models.mit import MiTBlock

    def blk(impl):
        return MiTBlock(dim=64, num_heads=1, sr_ratio=8, mlp_ratio=4,
                        qkv_bias=True, drop=0.0, attn_drop=0.0,
                        drop_path_rate=0.0, norm_eps=1e-6, block_impl=impl)

    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    params = blk(None).init(jax.random.PRNGKey(0), x)
    params_fused = blk("fused-interpret").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_fused)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_fused)):
        assert a.shape == b.shape

    want = blk(None).apply(params, x)
    got = blk("fused-interpret").apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_block_odd_geometry_matches_module(rng):
    """Non-multiple-of-8 W and sr-indivisible H/W (the 480² stage-1 shape
    class is 120×120; this covers the ragged-floor kv path too)."""
    from vss_cffm_tpu.models.mit import MiTBlock

    def blk(impl):
        return MiTBlock(dim=32, num_heads=1, sr_ratio=4, mlp_ratio=4,
                        qkv_bias=True, drop=0.0, attn_drop=0.0,
                        drop_path_rate=0.0, norm_eps=1e-6, block_impl=impl)

    x = jnp.asarray(rng.randn(1, 9, 11, 32).astype(np.float32))
    params = blk(None).init(jax.random.PRNGKey(0), x)
    want = blk(None).apply(params, x)
    got = blk("fused-interpret").apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("nh,sr", [(2, 4), (8, 1)])
def test_fused_block_multihead_matches_module(rng, nh, sr):
    """Multi-head (stage-2-like) and sr==1 (stage-4-like) fused blocks ≡
    the composed module."""
    from vss_cffm_tpu.models.mit import MiTBlock

    def blk(impl):
        return MiTBlock(dim=64, num_heads=nh, sr_ratio=sr, mlp_ratio=4,
                        qkv_bias=True, drop=0.0, attn_drop=0.0,
                        drop_path_rate=0.0, norm_eps=1e-6, block_impl=impl)

    x = jnp.asarray(rng.randn(1, 12, 12, 64).astype(np.float32))
    params = blk(None).init(jax.random.PRNGKey(0), x)
    want = blk(None).apply(params, x)
    got = blk("fused-interpret").apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_backbone_matches_default(rng):
    """Full MiT-B0 with block_impl='fused-interpret' ≡ the default backbone
    on the same params — all 4 stages (1/2/5/8 heads, sr 8/4/2/1) through
    the megakernel."""
    import dataclasses
    from vss_cffm_tpu.models.mit import MiT, MIT_VARIANTS

    cfg = MIT_VARIANTS["mit_b0"]
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = MiT(cfg).init(jax.random.PRNGKey(0), x)
    want = MiT(cfg).apply(params, x)
    got = MiT(dataclasses.replace(cfg, block_impl="fused-interpret")).apply(params, x)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)
