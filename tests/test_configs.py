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


def test_overrides_on_every_config():
    for path in CONFIGS:
        cfg = apply_overrides(load_config(path), ["optim.lr=1e-4", "data.batch_size=4"])
        assert cfg.optim.lr == 1e-4 and cfg.data.batch_size == 4
