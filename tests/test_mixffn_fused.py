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


@pytest.mark.parametrize("shape,ch,scales", [
    ((2, 12, 10, 16), 64, (1.0, 1.25)),   # uneven W (halo masking) + scale
    ((2, 8, 8, 32), 128, (0.0, 2.0)),     # dropped sample + 1/keep scale
])
def test_block_ffn_train_grads(rng, shape, ch, scales):
    """Differentiable fused block-FFN (interpret): forward AND all nine
    gradients vs jax.grad through the identical-math XLA composition."""
    from vss_cffm_tpu.ops.mixffn import block_ffn_train, block_ffn_train_xla

    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    params = _params(rng, c, ch)
    scale = jnp.asarray(scales, jnp.float32)

    args = (x, gamma, beta, *params, scale)
    out_k = block_ffn_train(*args, 1e-6, True)
    out_o = block_ffn_train_xla(*args, 1e-6)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_o),
                               rtol=2e-5, atol=2e-5)

    def loss_k(*a):
        return jnp.sum(jnp.sin(block_ffn_train(*a, 1e-6, True)))

    def loss_o(*a):
        return jnp.sum(jnp.sin(block_ffn_train_xla(*a, 1e-6)))

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    go = jax.grad(loss_o, argnums=tuple(range(9)))(*args)
    for name, a, b in zip(
            ["dx", "dgamma", "dbeta", "dw1", "db1", "dkdw", "dbdw", "dw2",
             "db2"], gk, go):
        scl = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=3e-5 * scl,
            err_msg=f"{name} gradient mismatch")


def test_mit_block_train_ffn_matches_composed(rng):
    """MiTBlock with train_block_impl='ffn-interpret' (training path) ≡ the
    composed training block on the same params, values and gradients (f32,
    drop_path 0 so the paths are deterministic)."""
    from vss_cffm_tpu.models.mit import MiTBlock

    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))

    def build(impl):
        return MiTBlock(dim=32, num_heads=2, sr_ratio=2, mlp_ratio=4,
                        qkv_bias=True, drop=0.0, attn_drop=0.0,
                        drop_path_rate=0.0, norm_eps=1e-6,
                        train_block_impl=impl)

    ref = build(None)
    fused = build("ffn-interpret")
    params = ref.init(jax.random.PRNGKey(0), x, False)

    def loss(mod, p):
        return jnp.sum(jnp.cos(mod.apply(p, x, False)))

    v_ref, g_ref = jax.value_and_grad(lambda p: loss(ref, p))(params)
    v_fused, g_fused = jax.value_and_grad(lambda p: loss(fused, p))(params)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_f, flat_r):
        scl = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-5 * scl)


def test_mit_block_train_full_matches_composed(rng):
    """MiTBlock with train_block_impl='full-interpret' (whole-block Pallas
    pair in training) ≡ the composed training block: values and all
    parameter gradients (f32, drop_path 0)."""
    from vss_cffm_tpu.models.mit import MiTBlock

    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))

    def build(impl):
        return MiTBlock(dim=32, num_heads=2, sr_ratio=2, mlp_ratio=4,
                        qkv_bias=True, drop=0.0, attn_drop=0.0,
                        drop_path_rate=0.0, norm_eps=1e-6,
                        train_block_impl=impl)

    ref = build(None)
    fused = build("full-interpret")
    params = ref.init(jax.random.PRNGKey(0), x, False)

    def loss(mod, p):
        return jnp.sum(jnp.cos(mod.apply(p, x, False)))

    v_ref, g_ref = jax.value_and_grad(lambda p: loss(ref, p))(params)
    v_fused, g_fused = jax.value_and_grad(lambda p: loss(fused, p))(params)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)
    flat_r, tdef_r = jax.tree_util.tree_flatten(g_ref)
    flat_f, tdef_f = jax.tree_util.tree_flatten(g_fused)
    assert tdef_r == tdef_f
    for a, b in zip(flat_f, flat_r):
        scl = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5 * scl)
