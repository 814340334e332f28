"""End-to-end CLI integration: train a few iters on the synthetic VSPW tree,
then evaluate the checkpoint — the full tools/train.py → tools/test.py path
the reference exercises via dist_train.sh/dist_test.sh."""

import json
import os
import subprocess
import sys

import pytest

from fixtures import make_fake_vspw

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CONFIG = """
import dataclasses
from vss_cffm_tpu.config import DataConfig, ExperimentConfig
from vss_cffm_tpu.models.segmentor import SegmentorConfig
from vss_cffm_tpu.models.heads import CFFMHeadConfig
from vss_cffm_tpu.models.cffm_transformer import CFFMDecoderConfig
from vss_cffm_tpu.models.mit import MIT_VARIANTS
from vss_cffm_tpu.train.optim import OptimConfig


def config():
    head = CFFMHeadConfig(
        in_channels=tuple(MIT_VARIANTS["mit_b0"].embed_dims),
        embed_dim=32, num_classes=124, num_clips=4,
        decoder=CFFMDecoderConfig(dim=32, depth=1, num_heads=2),
    )
    return ExperimentConfig(
        model=SegmentorConfig(backbone="mit_b0", head=head),
        optim=OptimConfig(lr=1e-3, max_iters=2, warmup_iters=0, warmup_ratio=1.0),
        data=DataConfig(data_root={data_root!r}, crop_size=(64, 64),
                        img_scale=(96, 64), batch_size=2, num_workers=2),
        work_dir={work_dir!r},
        checkpoint_interval=2,
        log_interval=1,
        bf16=False,
    )
"""


@pytest.fixture(scope="module")
def env():
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    return e


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = make_fake_vspw(str(tmp_path_factory.mktemp("vspw")), hw=(64, 96))
    work = str(tmp_path_factory.mktemp("work"))
    cfg_path = os.path.join(work, "tiny_config.py")
    with open(cfg_path, "w") as f:
        f.write(TINY_CONFIG.format(data_root=root, work_dir=work))
    return root, work, cfg_path


def test_train_then_test_cli(setup, env):
    root, work, cfg_path = setup
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), cfg_path],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = os.path.join(work, "ckpt")
    assert os.path.isdir(ckpt)

    out_json = os.path.join(work, "metrics.json")
    show_dir = os.path.join(work, "show")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"), cfg_path, ckpt,
         "--streaming", "--out", out_json, "--show", "--show-dir", show_dir],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out_json) as f:
        metrics = json.load(f)
    assert "mIoU" in metrics and "FWIoU" in metrics
    # --show wrote one blended overlay per frame (reference --show semantics)
    vis = show_dir + "_vis"
    import glob

    pngs = glob.glob(os.path.join(vis, "*", "*.png"))
    assert pngs, f"--show produced no overlays in {vis}"
    import cv2

    im = cv2.imread(pngs[0])
    assert im is not None and im.ndim == 3


def test_dist_train_launcher(setup, env, tmp_path):
    """tools/dist_train.sh with 2 processes on CPU — the reference's
    dist_train.sh workflow (reference tools/dist_train.sh:1-9): per-process
    data shards, Gloo collectives via jax.distributed, coordinated orbax
    save, rank-0-only logging."""
    root, work, cfg_path = setup
    dist_work = str(tmp_path / "dist")
    # one device per process (the multi-host shape) — drop the test
    # harness's 8-virtual-device flag for the children
    child_env = {**env, "PORT": "43931"}
    child_env["XLA_FLAGS"] = " ".join(
        f for f in child_env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "dist_train.sh"), cfg_path, "2",
         "--work-dir", dist_work],
        env=child_env,
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert os.path.isdir(os.path.join(dist_work, "ckpt"))
    # rank-0-only logging: each iter line appears exactly once
    log = r.stdout + r.stderr
    assert log.count("iter [2/2]") == 1, log[-2000:]


FT_CONFIG = """
import dataclasses
import sys
sys.path.insert(0, {work!r})
from tiny_config import config as base_config
from vss_cffm_tpu.train.optim import OptimConfig


def config():
    cfg = base_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, head=dataclasses.replace(cfg.model.head, mode="finetune")),
        optim=OptimConfig(lr=2e-4, max_iters=2, warmup_iters=0, warmup_ratio=1.0,
                          head_lr_mult=1.0),
        work_dir={ft_work!r},
        cluster_dir={cluster_dir!r},
        checkpoint_interval=2,
    )
"""


def test_cffm_plusplus_two_phase_cli(setup, env):
    """The full CFFM++ pipeline over the real CLIs (SURVEY §3.4 / VERDICT r1
    next-round #6): CFFM train → phase A prototype generation → phase B
    finetune warm-started from the CFFM checkpoint → eval with the blended
    x2 + 0.5·x3 output."""
    root, work, cfg_path = setup
    ckpt = os.path.join(work, "ckpt")
    if not os.path.isdir(ckpt):  # run after test_train_then_test_cli, or alone
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "train.py"), cfg_path],
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]

    cluster_dir = os.path.join(work, "centers")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "generate_prototypes.py"),
         cfg_path, ckpt, "--cluster-dir", cluster_dir,
         "--n-clusters", "20", "--num-frames", "4"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isfile(os.path.join(cluster_dir, "vid_a", "centers.npy"))

    ft_work = os.path.join(work, "ft")
    ft_cfg = os.path.join(work, "ft_config.py")
    with open(ft_cfg, "w") as f:
        f.write(FT_CONFIG.format(work=work, ft_work=ft_work, cluster_dir=cluster_dir))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), ft_cfg,
         "--load-from", ckpt],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "warm-started params from checkpoint" in (r.stdout + r.stderr)

    out_json = os.path.join(work, "metrics_ft.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"), ft_cfg,
         os.path.join(ft_work, "ckpt"), "--out", out_json],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out_json) as f:
        metrics = json.load(f)
    assert "mIoU" in metrics and 0.0 <= metrics["mIoU"] <= 1.0
