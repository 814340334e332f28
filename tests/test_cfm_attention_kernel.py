"""Fused CFM attention kernel (interpret) vs XLA formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from vss_cffm_tpu.ops.cfm_attention import cfm_attention


@pytest.mark.parametrize("nw", [4, 9])
def test_pallas_interpret_matches_xla(rng, nw):
    nh, hd, area = 2, 16, 49
    c = nh * hd
    gsizes = [49, 132, 25, 49, 25, 9]
    q = jnp.asarray(rng.randn(nw, area, c).astype(np.float32))
    ks = [jnp.asarray(rng.randn(nw, g, c).astype(np.float32)) for g in gsizes]
    vs = [jnp.asarray(rng.randn(nw, g, c).astype(np.float32)) for g in gsizes]
    bias = jnp.asarray(rng.randn(nh, area, sum(gsizes)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.rand(nw, sum(gsizes)) < 0.1, -100.0, 0.0).astype(np.float32)
    )
    want = np.asarray(cfm_attention(q, ks, vs, bias, mask, nh, force="xla"))
    got = np.asarray(cfm_attention(q, ks, vs, bias, mask, nh, force="interpret"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
