"""Golden parity: our flax modules vs the reference's OWN torch code.

Unlike tests/test_mit.py and tests/test_cffm_transformer.py (whose torch
oracles are builder-written functional re-implementations), these tests
execute the actual reference classes loaded from /root/reference
(``mix_transformer.py``, ``cffm_module/cffm_transformer.py``) with identical
weights pushed through ``utils/torch_convert.py`` — a shared misreading of
the reference cannot pass both sides here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from vss_cffm_tpu.models.cffm_transformer import CFFMDecoder, CFFMDecoderConfig
from vss_cffm_tpu.models.mit import MIT_VARIANTS, MiT
from vss_cffm_tpu.utils.torch_convert import _cffm_block, convert_backbone

from ref_modules import ref_cffm_transformer, ref_mix_transformer, state_dict_numpy


@pytest.mark.parametrize("hw,depth", [((14, 14), 2), ((9, 11), 2), ((14, 14), 4)])
def test_cffm_decoder_matches_reference_module(rng, hw, depth):
    """Full BasicLayer3d3 vs our CFFMDecoder, reference weights.

    Covers: rolled K/V validity selection, fc pooling, unfold entry order,
    all four relative-bias tables, −100.0 padding masks, window padding for
    non-multiple-of-7 H/W, last-frame-only residual (reference
    cffm_transformer.py:364-606, 629-856, 859-935). depth=2 is the B1/B2
    geometry, depth=4 the B5 one (block-chain state threading).
    """
    ref = ref_cffm_transformer()
    dim, heads = 64, 2
    layer = ref.BasicLayer3d3(
        dim=dim, depth=depth, num_heads=heads, window_size=7, expand_size=3,
        mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop=0.0, attn_drop=0.0,
        drop_path=0.0, pool_method="fc", downsample=None, focal_level=2,
        focal_window=5, use_checkpoint=False,
        focal_l_clips=[1, 2, 3], focal_kernel_clips=[7, 5, 3],
    )
    layer.eval()
    sd = state_dict_numpy(layer)
    params = {f"blocks_{i}": _cffm_block(sd, f"blocks.{i}", 2, 3) for i in range(depth)}

    h, w = hw
    x = (rng.randn(1, 4, h, w, dim) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(x).permute(0, 1, 4, 2, 3))  # (B,D,C,H,W)
    want = want.permute(0, 1, 3, 4, 2).numpy()

    cfg = CFFMDecoderConfig(dim=dim, depth=depth, num_heads=heads)
    got = np.asarray(CFFMDecoder(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["mit_b0", "mit_b2"])
def test_mit_backbone_matches_reference_module(rng, variant):
    """Full backbone forward_features vs our MiT, reference weights.

    Covers all 4 stages: overlap patch embeds, SRA attention (sr 8/4/2/1),
    MixFFN depthwise conv, per-stage LayerNorm with eps=1e-6
    (reference mix_transformer.py:313-349, 373-424). mit_b0 = dims
    (32,64,160,256); mit_b2 = the deeper (3,4,6,3) block schedule shipped by
    the B2 configs.
    """
    ref = ref_mix_transformer()
    net = getattr(ref, variant)()
    net.eval()
    depths = MIT_VARIANTS[variant].depths
    params = convert_backbone(state_dict_numpy(net), tuple(depths))

    x = (rng.randn(1, 64, 96, 3) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2))  # list of NCHW

    got = MiT(MIT_VARIANTS[variant]).apply({"params": params}, jnp.asarray(x))
    assert len(got) == len(want) == 4
    for i, (g, wt) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g),
            wt.permute(0, 2, 3, 1).numpy(),
            rtol=5e-4, atol=5e-4,
            err_msg=f"stage {i + 1}",
        )


def test_mit_b1_block_chain_matches_reference(rng):
    """Stage-1 Block chain of mit_b1 (the highest-token-count stage) at a
    non-square resolution, exercising sr_ratio=8 KV reduction."""
    ref = ref_mix_transformer()
    net = ref.mit_b1()
    net.eval()
    params = convert_backbone(state_dict_numpy(net), (2, 2, 2, 2))

    x = (rng.randn(1, 56, 40, 3) * 0.5).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        b = xt.shape[0]
        h1, H, W = net.patch_embed1(xt)
        for blk in net.block1:
            h1 = blk(h1, H, W)
        h1 = net.norm1(h1)
        want = h1.reshape(b, H, W, -1).numpy()

    feats = MiT(MIT_VARIANTS["mit_b1"]).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(feats[0]), want, rtol=5e-4, atol=5e-4)


def test_full_segmentor_matches_reference_modules(rng):
    """End-to-end golden parity: reference mit_b1 + CFFMHead_clips_resize1_8
    (the reference's OWN head code, stub-loaded) vs our CFFMSegmentor with
    ``convert_segmentor``-mapped weights — backbone, per-frame MLP decode,
    SyncBN linear_fuse, CFFM decoder, refined-frame prediction, eval output
    path (reference ``cffm_head.py:41-157``, ``encoder_decoder.py:367-378``)."""
    from ref_modules import ref_cffm_head
    from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
    from vss_cffm_tpu.utils.torch_convert import convert_segmentor

    head_mod = ref_cffm_head()
    mix = ref_mix_transformer()
    torch.manual_seed(0)

    class RefSegmentor(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = mix.mit_b1()
            self.decode_head = head_mod.CFFMHead_clips_resize1_8(
                feature_strides=[4, 8, 16, 32],
                in_channels=[64, 128, 320, 512],
                in_index=[0, 1, 2, 3],
                channels=128,
                dropout_ratio=0.1,
                num_classes=124,
                norm_cfg=dict(type="SyncBN", requires_grad=True),
                align_corners=False,
                decoder_params=dict(embed_dim=256, depths=2),
                loss_decode=dict(type="CrossEntropyLoss"),
                num_clips=4,
            )

    refnet = RefSegmentor()
    refnet.eval()

    h = w = 112
    x = (rng.randn(1, 4, h, w, 3) * 0.5).astype(np.float32)
    with torch.no_grad():
        frames = torch.from_numpy(x[0]).permute(0, 3, 1, 2)  # (T,3,H,W)
        feats = refnet.backbone(frames)
        # eval path returns the refined last-frame logits, already squeezed
        # to (B, C, h/4, w/4) (cffm_head.py:152-155)
        want = refnet.decode_head(feats, batch_size=1, num_clips=4)
        want = want.permute(0, 2, 3, 1).numpy()  # (1, h/4, w/4, C)

    cfg = build_model_config("b1")
    variables = convert_segmentor(state_dict_numpy(refnet), cfg)
    model = CFFMSegmentor(cfg)  # f32
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), False,
    ))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_finetune_head_matches_reference_modules(rng, tmp_path, monkeypatch):
    """CFFM++ finetune (GTC) golden parity: reference
    ``CFFMHead_clips_resize1_8_finetune_w_prototype3`` + ``BasicLayer_cluster``
    (the actual reference code) vs our finetune-mode segmentor — covers the
    cluster cross-attention, frozen linear_fuse eval semantics, and the
    eval blend x2 + 0.5·x3 (reference ``cffm_head.py:304-536``,
    ``pvt/swin_transformer_2d.py:1039-1148``)."""
    import dataclasses

    from ref_modules import ref_cffm_head
    from vss_cffm_tpu.models import CFFMSegmentor, build_model_config
    from vss_cffm_tpu.utils.torch_convert import convert_segmentor

    head_mod = ref_cffm_head()
    mix = ref_mix_transformer()
    torch.manual_seed(1)
    # the reference forward calls .cuda() on the loaded centers; no GPU here
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.chdir(tmp_path)

    video = "vid_golden"
    centers = torch.from_numpy((rng.randn(1, 100, 256) * 0.2).astype(np.float32))
    cdir = tmp_path / "cluster_centers" / video
    cdir.mkdir(parents=True)
    torch.save(centers, cdir / "centers.pt")

    class RefSegmentor(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = mix.mit_b1()
            self.decode_head = head_mod.CFFMHead_clips_resize1_8_finetune_w_prototype3(
                feature_strides=[4, 8, 16, 32],
                in_channels=[64, 128, 320, 512],
                in_index=[0, 1, 2, 3],
                channels=128,
                dropout_ratio=0.1,
                num_classes=124,
                norm_cfg=dict(type="SyncBN", requires_grad=True),
                align_corners=False,
                decoder_params=dict(embed_dim=256, depths=2),
                loss_decode=dict(type="CrossEntropyLoss"),
                num_clips=4,
            )

    refnet = RefSegmentor()
    refnet.eval()

    h = w = 112
    x = (rng.randn(1, 4, h, w, 3) * 0.5).astype(np.float32)
    img_metas = [{"filename": f"data/{video}/origin/00000042.jpg"}]
    with torch.no_grad():
        frames = torch.from_numpy(x[0]).permute(0, 3, 1, 2)
        feats = refnet.backbone(frames)
        want = refnet.decode_head(feats, batch_size=1, num_clips=4,
                                  img_metas=img_metas)
        want = want.permute(0, 2, 3, 1).numpy()  # x2 + 0.5*x3, (1, h/4, w/4, C)

    cfg = build_model_config("b1", mode="finetune")
    variables = convert_segmentor(state_dict_numpy(refnet), cfg)
    model = CFFMSegmentor(cfg)
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), False,
        (jnp.asarray(centers.numpy()), jnp.ones((1, 100), bool)),
    ))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
