"""Checkpoint converter: structure round-trip against a synthetic torch sd."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.utils.torch_convert import convert_segmentor
from test_heads_segmentor import tiny_segmentor


def _flax_to_torch_shape(path: str, arr: np.ndarray):
    """Inverse of the converter's layout mapping, keyed on param name."""
    if path.endswith("kernel") and arr.ndim == 2:
        return arr.T
    if path.endswith("kernel") and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))
    return arr


def _synthetic_torch_sd(params, batch_stats, rng):
    """Build a reference-style state dict covering our tiny model."""
    sd = {}

    def emit(torch_key, arr):
        sd[torch_key] = rng.randn(*arr.shape).astype(np.float32)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        name = "/".join(keys)
        # random values in flax layout, transposed into torch layout
        arr = rng.randn(*np.asarray(leaf).shape).astype(np.float32)
        sd[_torch_key(keys)] = _flax_to_torch_shape(name, arr)
    # merged fuse kernel maps back to a (f, 4f, 1, 1) torch conv weight
    fw = sd["decode_head.linear_fuse.conv.weight"]
    sd["decode_head.linear_fuse.conv.weight"] = fw[:, :, None, None]
    # BN running stats
    sd["decode_head.linear_fuse.bn.running_mean"] = rng.randn(
        *np.asarray(batch_stats["decode_head"]["decode"]["bn"]["mean"]).shape
    ).astype(np.float32)
    sd["decode_head.linear_fuse.bn.running_var"] = np.abs(rng.randn(
        *np.asarray(batch_stats["decode_head"]["decode"]["bn"]["var"]).shape
    )).astype(np.float32)
    return sd


def _torch_key(keys):
    """Map our flax param path to the reference torch key."""
    k = list(keys)
    scope = k[0]
    if scope == "backbone":
        name = k[1]
        if name.startswith("patch_embed"):
            return f"backbone.{name}.{k[2]}.{_wname(k[-1])}"
        if name.startswith("block"):
            stage, j = name[5:].split("_")
            rest = k[2:]
            if rest[0] == "mlp" and rest[1] == "dwconv":
                return f"backbone.block{stage}.{j}.mlp.dwconv.dwconv.{_wname(rest[-1])}"
            return f"backbone.block{stage}.{j}." + ".".join(rest[:-1]) + "." + _wname(rest[-1])
        if name.startswith("norm"):
            return f"backbone.{name}.{_wname(k[-1])}"
    if scope == "decode_head":
        rest = k[1:]
        if rest[0] == "decode":
            rest = rest[1:]  # linear_cX/proj, fuse_kernel, or bn
            if rest[0] == "fuse_kernel":
                return "decode_head.linear_fuse.conv.weight"
            if rest[0] == "bn":
                return f"decode_head.linear_fuse.bn.{_wname(rest[-1])}"
            return "decode_head." + ".".join(rest[:-1]) + "." + _wname(rest[-1])
        if rest[0].startswith("linear_pred"):
            return f"decode_head.{rest[0]}.{_wname(rest[-1])}"
        if rest[0] == "decoder_focal":
            blk = rest[1].replace("blocks_", "blocks.")
            inner = rest[2:]
            if inner[0] == "attn":
                a = inner[1]
                mapping = {
                    "qkv_kernel": "attn.qkv.weight",
                    "qkv_bias": "attn.qkv.bias",
                    "relative_position_bias_table": "attn.relative_position_bias_table",
                    "relative_position_bias_to_neighbors":
                        "attn.relative_position_bias_table_to_neighbors",
                }
                if a in mapping:
                    return f"decode_head.decoder_focal.{blk}.{mapping[a]}"
                if a.startswith("relative_position_bias_to_windows_clips_"):
                    i = a.rsplit("_", 1)[1]
                    return (f"decode_head.decoder_focal.{blk}.attn."
                            f"relative_position_bias_table_to_windows_clips.{i}")
                if a.startswith("relative_position_bias_to_windows_"):
                    i = a.rsplit("_", 1)[1]
                    return (f"decode_head.decoder_focal.{blk}.attn."
                            f"relative_position_bias_table_to_windows.{i}")
                if a == "proj":
                    return f"decode_head.decoder_focal.{blk}.attn.proj.{_wname(inner[-1])}"
            if inner[0].startswith("pool_layers_clips_"):
                i = inner[0].rsplit("_", 1)[1]
                return f"decode_head.decoder_focal.{blk}.pool_layers_clips.{i}.{_wname(inner[-1])}"
            if inner[0].startswith("pool_layers_"):
                i = inner[0].rsplit("_", 1)[1]
                return f"decode_head.decoder_focal.{blk}.pool_layers.{i}.{_wname(inner[-1])}"
            return f"decode_head.decoder_focal.{blk}." + ".".join(inner[:-1]) + "." + _wname(inner[-1])
        if rest[0] == "decoder_swin":
            inner = rest[1:]
            base = "decode_head.decoder_swin.blocks.0."
            if inner[0] == "attn":
                return base + "attn." + ".".join(inner[1:-1]) + "." + _wname(inner[-1])
            if inner[0] in ("mlp_fc1", "mlp_fc2"):
                return base + "mlp." + inner[0][4:] + "." + _wname(inner[-1])
            return base + ".".join(inner[:-1]) + "." + _wname(inner[-1])
    raise KeyError(keys)


def _wname(flax_name):
    return {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(flax_name, flax_name)


@pytest.mark.parametrize("mode", ["cffm", "finetune"])
def test_convert_structure_roundtrip(rng, mode):
    model = tiny_segmentor(mode)
    x = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    kwargs = {}
    if mode == "finetune":
        kwargs["cluster_centers"] = jnp.zeros((1, 10, 32))
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    params, batch_stats = variables["params"], variables["batch_stats"]

    sd = _synthetic_torch_sd(params, batch_stats, rng)
    # reference neighbor-bias has a leading batch dim of 1
    for key in list(sd):
        if key.endswith("relative_position_bias_table_to_neighbors"):
            sd[key] = sd[key][None]

    converted = convert_segmentor(sd, model.config)

    # exact structural match with the flax-initialised tree
    want_struct = jax.tree_util.tree_structure(params)
    got_struct = jax.tree_util.tree_structure(converted["params"])
    assert want_struct == got_struct
    shapes_ok = jax.tree.map(lambda a, b: np.asarray(a).shape == np.asarray(b).shape,
                             params, converted["params"])
    assert all(jax.tree.leaves(shapes_ok))

    # converted params actually run
    out = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        x, False, kwargs.get("cluster_centers"),
    )
    assert out.shape[-1] == 5
