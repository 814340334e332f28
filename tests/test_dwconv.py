"""Pallas fused depthwise-conv kernel vs XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vss_cffm_tpu.ops.dwconv import dwconv3x3


@pytest.mark.parametrize("gelu", [False, True])
@pytest.mark.parametrize("shape", [(2, 12, 10, 16), (1, 24, 16, 8)])
def test_pallas_interpret_matches_xla(rng, shape, gelu):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32))
    b = jnp.asarray(rng.randn(c).astype(np.float32))
    ref = dwconv3x3(x, k, b, gelu=gelu, force="xla")
    got = dwconv3x3(x, k, b, gelu=gelu, force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("gelu", [False, True])
def test_shifts_cvjp_grad_parity(rng, gelu):
    """Hand-written shifts backward ≡ autodiff of the conv formulation."""
    import jax

    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    def loss(fn):
        def f(x, k, b):
            y = fn(x, k, b)
            return jnp.sum(y * jnp.cos(y))  # non-trivial cotangent

        return f

    ref_f = loss(lambda x, k, b: dwconv3x3(x, k, b, gelu=gelu, force="xla"))
    got_f = loss(lambda x, k, b: dwconv3x3(x, k, b, gelu=gelu, force="shifts-cvjp"))
    np.testing.assert_allclose(float(got_f(x, k, b)), float(ref_f(x, k, b)), rtol=1e-5)
    ref_g = jax.grad(ref_f, argnums=(0, 1, 2))(x, k, b)
    got_g = jax.grad(got_f, argnums=(0, 1, 2))(x, k, b)
    for gg, rg in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("force", ["xla", "shifts"])
def test_xla_path_matches_torch(rng, force):
    x = rng.randn(2, 9, 11, 6).astype(np.float32)
    k = rng.randn(3, 3, 1, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    got = np.asarray(dwconv3x3(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b),
                               gelu=True, force=force))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    kt = torch.from_numpy(k).permute(3, 2, 0, 1)
    want = F.conv2d(xt, kt, torch.from_numpy(b), padding=1, groups=6)
    want = F.gelu(want).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
