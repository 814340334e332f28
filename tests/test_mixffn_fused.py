"""Fused MixFFN kernel (interpret) vs the XLA composition and the module path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.ops.mixffn import mixffn_fused, mixffn_xla


def _params(rng, c, ch):
    return (
        jnp.asarray(rng.randn(c, ch).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(ch).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(3, 3, 1, ch).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(ch).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(ch, c).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(c).astype(np.float32) * 0.05),
    )


@pytest.mark.parametrize("shape,ch", [
    ((2, 12, 12, 64), 256),   # stage-1-like (row tiling, wide W pad)
    ((1, 9, 11, 32), 128),    # odd H/W: halo masking + alignment padding
    ((1, 5, 5, 128), 512),    # stage-4-like (tiny spatial, wide channels)
])
def test_fused_matches_xla(rng, shape, ch):
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    params = _params(rng, c, ch)
    got = mixffn_fused(x, *params, interpret=True)
    want = mixffn_xla(x, *params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape,ch", [
    ((2, 12, 12, 64), 256),
    ((1, 9, 11, 32), 128),
])
def test_block_ffn_matches_xla(rng, shape, ch):
    """LN + FFN + residual kernel (interpret) vs the XLA composition."""
    from vss_cffm_tpu.ops.mixffn import block_ffn_fused, block_ffn_xla

    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    params = _params(rng, c, ch)
    got = block_ffn_fused(x, gamma, beta, *params, eps=1e-6, interpret=True)
    want = block_ffn_xla(x, gamma, beta, *params, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_block_fused_matches_block_module(rng):
    """MiTBlock with dwconv_impl='fused-interpret' ≡ the default block on
    the same params — proves the LN2/MixFFN/residual fusion is invisible to
    checkpoints and numerics (f32)."""
    from vss_cffm_tpu.models.mit import MiTBlock

    x = jnp.asarray(rng.randn(2, 10, 12, 32).astype(np.float32))
    kw = dict(dim=32, num_heads=2, sr_ratio=2, mlp_ratio=4, qkv_bias=True,
              drop=0.0, attn_drop=0.0, drop_path_rate=0.0, norm_eps=1e-6)
    ref_mod = MiTBlock(**kw)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    want = ref_mod.apply(variables, x, True)
    fused_mod = MiTBlock(dwconv_impl="fused-interpret", **kw)
    # same param tree in both directions
    v2 = fused_mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, v2) == jax.tree.map(lambda a: a.shape, variables)
    got = fused_mod.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fused_matches_module_composition(rng):
    """The kernel must reproduce the module path (Dense → dwconv+GELU →
    Dense) — the thing golden tests pin to the reference."""
    from vss_cffm_tpu.models.mit import MixFFN

    x = jnp.asarray(rng.randn(2, 10, 14, 48).astype(np.float32))
    mod = MixFFN(dim=48, hidden_dim=192, dwconv_impl="xla")
    variables = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(variables, x, True)

    fused = MixFFN(dim=48, hidden_dim=192, dwconv_impl="fused-interpret")
    got = fused.apply(variables, x, True)  # same param tree by construction
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_param_tree_unchanged(rng):
    """_DenseParams/_DWConvParams must reproduce the nn.Dense/DWConv3x3
    tree exactly (checkpoint + torch-convert compatibility)."""
    from vss_cffm_tpu.models.mit import MixFFN

    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    variables = MixFFN(dim=16, hidden_dim=64).init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    assert set(p) == {"fc1", "dwconv", "fc2"}
    assert p["fc1"]["kernel"].shape == (16, 64)
    assert p["fc1"]["bias"].shape == (64,)
    assert p["dwconv"]["kernel"].shape == (3, 3, 1, 64)
    assert p["dwconv"]["bias"].shape == (64,)
    assert p["fc2"]["kernel"].shape == (64, 16)
    assert p["fc2"]["bias"].shape == (16,)
