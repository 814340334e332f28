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
