"""Config integrity: every shipped config loads and its model builds.

Mirror of the reference's ``tests/test_config.py`` strategy (build the
segmentor from every config, no forward) — here via ``jax.eval_shape``,
which traces parameter construction without any compute, so even CFFM-B5
checks in milliseconds.
"""

import glob
import os

import pytest

import jax
import jax.numpy as jnp

from vss_cffm_tpu.config import apply_overrides, load_config
from vss_cffm_tpu.models.segmentor import build_segmentor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.py")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    cfg = load_config(path)
    model = build_segmentor(cfg.model)
    kwargs = {}
    if cfg.model.arch == "image":
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    else:
        t = len(cfg.data.dilation) + 1
        sample = jnp.zeros((1, max(t, 4), 64, 64, 3), jnp.float32)
        if cfg.model.head.mode == "finetune":
            kwargs["cluster_centers"] = jnp.zeros((1, 100, cfg.model.head.embed_dim))
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, **kwargs), jax.random.PRNGKey(0), sample
    )
    assert "params" in shapes
    n_params = sum(
        int(__import__("numpy").prod(l.shape)) for l in jax.tree.leaves(shapes["params"])
    )
    assert n_params > 1e5
    # train-mode trace too (dropout/droppath rngs, clip-loss-shaped output)
    train_shapes = jax.eval_shape(
        lambda k, x: model.init({"params": k, "dropout": k, "droppath": k},
                                x, True, **kwargs),
        jax.random.PRNGKey(0), sample,
    )
    assert "params" in train_shapes


def test_config_matrix_complete():
    """The reference ships 12 live configs — B{0,1,2,5} x {160k base,
    gene_prototype, fine_w_proto.40k} (``local_configs/cffm/B*/``).
    All 12 must exist here under the same naming scheme."""
    names = {os.path.basename(p) for p in CONFIGS}
    for v in ("b0", "b1", "b2", "b5"):
        for suffix in ("160k", "finetune_40k", "gene_prototype"):
            assert f"cffm_{v}_vspw_{suffix}.py" in names


def test_overrides_on_every_config():
    for path in CONFIGS:
        cfg = apply_overrides(load_config(path), ["optim.lr=1e-4", "data.batch_size=4"])
        assert cfg.optim.lr == 1e-4 and cfg.data.batch_size == 4
