"""Metrics parity, k-means, end-to-end eval driver, prototype pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_fake_vspw
from vss_cffm_tpu.data import VSPWVideoDataset, iterate_eval
from vss_cffm_tpu.eval import (
    ClipEvaluator,
    ClusterStore,
    confusion_matrix_np,
    eval_metrics,
    fwiou,
    generate_prototypes,
    mean_iou_seen,
    update_confusion,
    video_consistency,
)
from vss_cffm_tpu.ops.kmeans import kmeans
from test_heads_segmentor import tiny_segmentor


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    return make_fake_vspw(str(tmp_path_factory.mktemp("vspw")), hw=(64, 96),
                          num_classes=5)


def test_update_confusion_matches_numpy(rng):
    c = 6
    pred = rng.randint(0, c, (40, 40))
    label = rng.randint(0, c, (40, 40))
    label[:5] = 255
    got = np.asarray(update_confusion(jnp.zeros((c, c), jnp.int32),
                                      jnp.asarray(pred), jnp.asarray(label), c))
    want = confusion_matrix_np(pred, label, c)
    np.testing.assert_array_equal(got, want)


def test_eval_metrics_perfect_prediction(rng):
    c = 4
    label = rng.randint(0, c, (100,))
    cm = confusion_matrix_np(label, label, c)
    m = eval_metrics(cm)
    assert m["mIoU"] == pytest.approx(1.0)
    assert m["aAcc"] == pytest.approx(1.0)
    assert mean_iou_seen(cm) == pytest.approx(1.0)
    assert fwiou(cm) == pytest.approx(1.0)


def test_mean_iou_seen_masks_absent_classes():
    cm = np.zeros((3, 3))
    cm[0, 0] = 10  # class 0 perfect
    cm[1, 1] = 5
    cm[1, 0] = 5  # class 1: IoU = 5 / (10 + 5 + 5 - 5)... gt=10, pred 5 correct
    # class 2 never appears in GT -> masked out of the seen-mean
    got = mean_iou_seen(cm)
    iou0 = 10 / 15
    iou1 = 5 / 10
    assert got == pytest.approx((iou0 + iou1) / 2)


def test_video_consistency_static_video():
    g = [np.ones((4, 4), int)] * 10
    p = [np.ones((4, 4), int)] * 10
    accs = video_consistency(g, p, 8)
    assert accs == [1.0, 1.0]
    # prediction flickers -> zero consistency
    p2 = [np.full((4, 4), i % 2) for i in range(10)]
    accs2 = video_consistency(g, p2, 8)
    assert accs2 == [0.0, 0.0]


def test_kmeans_separates_clusters(rng):
    a = rng.randn(100, 8) + 10
    b = rng.randn(100, 8) - 10
    pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    centers, labels = kmeans(jax.random.PRNGKey(0), pts, 2, 10)
    labels = np.asarray(labels)
    assert len(set(labels[:100])) == 1 and len(set(labels[100:])) == 1
    assert labels[0] != labels[100]
    got = np.sort(np.asarray(centers)[:, 0])
    np.testing.assert_allclose(got, [-10, 10], atol=0.5)


def test_clip_evaluator_end_to_end(vspw_root, tmp_path):
    model = tiny_segmentor()
    ds = VSPWVideoDataset(vspw_root, "val")
    x = jnp.zeros((1, 4, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ev = ClipEvaluator(model, variables["params"], variables["batch_stats"], num_classes=5)
    out = ev.run(iterate_eval(ds, num_workers=2), dataset=ds, keep_for_vc=True,
                 save_dir=str(tmp_path / "preds"))
    assert 0.0 <= out["aAcc"] <= 1.0
    assert "VC8" in out and "mIoU_seen" in out and "FWIoU" in out
    # PNGs written per frame, pixel-exact roundtrip in palette mode
    import glob
    from PIL import Image

    paths = glob.glob(str(tmp_path / "preds" / "*" / "*.png"))
    assert len(paths) == 15
    img = Image.open(paths[0])
    assert img.mode == "P"


def test_save_pred_png_roundtrip(rng, tmp_path):
    from PIL import Image
    from vss_cffm_tpu.eval import save_pred_png

    pred = rng.randint(0, 124, (33, 47)).astype(np.uint8)
    path = str(tmp_path / "v" / "f.png")
    save_pred_png(pred, path)
    back = np.array(Image.open(path))
    np.testing.assert_array_equal(back, pred)


def test_cluster_store_multi_file_subset(tmp_path, rng):
    """Multiple centre files per video: concat + random 80% subset used
    AS-IS (reference ``cffm_head.py:437-452``), zero-padded to the static
    ``pad_to`` with a validity mask — no resampling-with-replacement."""
    from vss_cffm_tpu.eval import ClusterStore

    root = tmp_path / "centers"
    vdir = root / "vid_x"
    vdir.mkdir(parents=True)
    a = rng.randn(10, 8).astype(np.float32)
    b = rng.randn(10, 8).astype(np.float32)
    np.save(vdir / "a.npy", a)
    np.save(vdir / "b.npy", b)
    # a second, single-file video with fewer centres than pad_to
    vdir2 = root / "vid_y"
    vdir2.mkdir(parents=True)
    np.save(vdir2 / "centers.npy", rng.randn(5, 8).astype(np.float32))

    store = ClusterStore(str(root), n_clusters=4)
    # pad_to = max kept count = int(0.8 * 20) = 16
    assert store.pad_to == 16
    c, m = store("vid_x")
    assert c.shape == (16, 8) and m.shape == (16,)
    assert m.all()  # 16 kept of 20 → no padding
    # every kept row is one of the original centres, no duplicates
    pool = np.concatenate([a, b])
    matches = (c[:, None, :] == pool[None, :, :]).all(-1)
    assert matches.any(1).all() and matches.sum() == 16

    c2, m2 = store("vid_y")
    assert m2.sum() == 5 and not m2[5:].any()
    np.testing.assert_array_equal(c2[5:], 0.0)
    # memoised: second call returns the identical tuple
    assert store("vid_x") is store("vid_x")
    with pytest.raises(FileNotFoundError):
        store("missing_video")


def test_prototype_generation_and_store(vspw_root, tmp_path):
    model = tiny_segmentor()
    ds = VSPWVideoDataset(vspw_root, "train_val_generate_prototype")
    x = jnp.zeros((1, 4, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    save = str(tmp_path / "centers")
    generate_prototypes(model, variables["params"], variables["batch_stats"], ds, save,
                        n_clusters=7, num_frames=4)
    store = ClusterStore(save, n_clusters=7)
    c, m = store("vid_a")
    assert c.shape == (7, 32) and m.all()
    centers, masks = store.batch(["vid_a", "vid_b"])
    assert centers.shape == (2, 7, 32) and masks.shape == (2, 7)


def test_format_class_table():
    from vss_cffm_tpu.eval.metrics import format_class_table

    cm = np.zeros((3, 3), np.int64)
    cm[0, 0] = 8
    cm[0, 1] = 2  # class 0: IoU 8/10, Acc 80%
    cm[1, 1] = 5  # class 1: union 5+2, IoU 5/7
    # class 2 absent -> nan row
    table = format_class_table(cm, ["road", "sky", "void"])
    assert "per class results:" in table and "Summary:" in table
    road = next(l for l in table.splitlines() if "road" in l)
    assert "80.00" in road
    sky = next(l for l in table.splitlines() if "sky" in l)
    assert f"{100 * 5 / 7:.2f}" in sky
    void = next(l for l in table.splitlines() if "void" in l)
    assert "nan" in void


def test_evaluator_set_params_no_retrace(rng):
    """set_params must change predictions (params are jit args, not baked
    constants) and must not grow the jit compile cache."""
    model = tiny_segmentor()
    x = jnp.asarray(rng.randn(1, 4, 64, 64, 3).astype(np.float32))
    v0 = model.init(jax.random.PRNGKey(0), x)
    v1 = model.init(jax.random.PRNGKey(7), x)

    ev = ClipEvaluator(model, v0["params"], v0["batch_stats"], num_classes=5)
    item = {"imgs": np.asarray(x[0]), "ori_shape": (64, 64), "video": "v"}
    p0 = np.asarray(ev.predict(item))
    n_compiles = ev._predict._cache_size()
    ev.set_params(v1["params"], v1["batch_stats"])
    ev.reset()
    assert ev.confusion.sum() == 0
    p1 = np.asarray(ev.predict(item))
    assert ev._predict._cache_size() == n_compiles  # no retrace
    assert (p0 != p1).any()  # new weights actually used
