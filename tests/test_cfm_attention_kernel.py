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


def test_packed_and_grouped_layouts_agree(rng):
    """The inference K/V layouts ('packed' concat vs grouped refs) are the
    same kernel fed differently — outputs must match bit-for-bit math-wise
    (both reduce in f32)."""
    from vss_cffm_tpu.ops.cfm_attention import _cfm_attention_pallas_impl

    nw, nh, hd, area = 4, 2, 16, 49
    c = nh * hd
    gsizes = [49, 132, 25]
    q = jnp.asarray(rng.randn(nw, area, c).astype(np.float32))
    ks = tuple(jnp.asarray(rng.randn(nw, g, c).astype(np.float32)) for g in gsizes)
    vs = tuple(jnp.asarray(rng.randn(nw, g, c).astype(np.float32)) for g in gsizes)
    bias = jnp.asarray(rng.randn(nh, area, sum(gsizes)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.rand(nw, sum(gsizes)) < 0.1, -100.0, 0.0).astype(np.float32))
    grouped = _cfm_attention_pallas_impl(q, ks, vs, bias, mask, nh,
                                         interpret=True, grouped=True)
    packed = _cfm_attention_pallas_impl(q, ks, vs, bias, mask, nh,
                                        interpret=True, grouped=False)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(grouped),
                               rtol=1e-6, atol=1e-6)


def test_pallas_custom_vjp_matches_xla_grad(rng, monkeypatch):
    """The Pallas path's custom_vjp must produce the XLA formulation's grads."""
    import jax
    import vss_cffm_tpu.ops.cfm_attention as m

    orig = m._cfm_attention_pallas_impl
    monkeypatch.setattr(
        m, "_cfm_attention_pallas_impl",
        lambda q, ks, vs, b, mk, nh, **kw:
            orig(q, ks, vs, b, mk, nh, **{**kw, "interpret": True}),
    )
    orig_b = m._cfm_attention_bwd_pallas
    monkeypatch.setattr(
        m, "_cfm_attention_bwd_pallas",
        lambda *a, **k: orig_b(*a, **{**k, "interpret": True}),
    )
    orig_rc = m._cfm_attention_bwd_pallas_rc
    monkeypatch.setattr(
        m, "_cfm_attention_bwd_pallas_rc",
        lambda *a, **k: orig_rc(*a, **{**k, "interpret": True}),
    )
    nw, nh, hd, area = 4, 2, 16, 49
    c = nh * hd
    gsizes = [49, 132, 25]
    q = jnp.asarray(rng.randn(nw, area, c).astype(np.float32))
    ks = tuple(jnp.asarray(rng.randn(nw, g, c).astype(np.float32)) for g in gsizes)
    vs = tuple(jnp.asarray(rng.randn(nw, g, c).astype(np.float32)) for g in gsizes)
    bias = jnp.asarray(rng.randn(nh, area, sum(gsizes)).astype(np.float32))
    mask = jnp.zeros((nw, sum(gsizes)), jnp.float32)

    f_p = lambda *a: jnp.sum(cfm_attention(*a, mask, nh, force="pallas") ** 2)
    f_x = lambda *a: jnp.sum(cfm_attention(*a, mask, nh, force="xla") ** 2)
    gp = jax.grad(f_p, argnums=(0, 1, 2, 3))(q, ks, vs, bias)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3))(q, ks, vs, bias)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
