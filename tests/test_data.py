"""Data-pipeline tests on a synthetic mini-ScanNet written to tmp disk:
PLY reader, Scan loader, positive maps, augmentation, JointGroundingDataset
sample schema, DataLoader batching/sharding."""

import numpy as np
import pytest

from butd_detr_tpu.data import (
    DataLoader,
    JointGroundingDataset,
    MAX_NUM_OBJ,
    Scan,
    ScannetDatasetConfig,
    augment_pointcloud,
    box2points,
    collate,
    find_rel,
    is_view_dep,
    points2box,
    read_ply,
    rot_x,
    rot_y,
    rot_z,
    scannet_classes,
    token_positive_map,
    transform_boxes,
)
from butd_detr_tpu.data.scan import load_scans_parallel
from butd_detr_tpu.data.synthetic import make_fake_scannet
from butd_detr_tpu.lang.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    return make_fake_scannet(str(root), points_per_scan=2000)


@pytest.fixture(scope="module")
def scans(fake_root):
    import os.path as osp

    with open(osp.join(fake_root, "meta_data", "scannetv2_train.txt")) as f:
        ids = [l.strip() for l in f if l.strip()]
    return load_scans_parallel(
        ids, osp.join(fake_root, "scans"),
        osp.join(fake_root, "meta_data"), num_workers=1, keep_points=2048,
    )


def dataset(fake_root, scans, **kw):
    kw.setdefault("dataset_dict", {"sr3d": 1})
    kw.setdefault("split", "train")
    kw.setdefault("tokenizer", SimpleTokenizer(max_len=256))
    return JointGroundingDataset(
        data_path=fake_root, scans=scans, **kw
    )


# ---------------- config / vocab ----------------


def test_scannet_config_vocab():
    dc = ScannetDatasetConfig(485)
    assert dc.num_class == 485
    assert dc.class2type[325] == "object"
    assert dc.type2class["chair"] == 1
    assert len(dc.nyu40ids) == 485
    dc18 = ScannetDatasetConfig(18)
    assert dc18.type2class["other furniture"] == 17
    assert len(scannet_classes(18)) == 18


def test_relation_helpers():
    assert is_view_dep("the chair on the left side")
    assert not is_view_dep("the chair near the table")
    assert find_rel("the chair close to the table") == "near"
    assert find_rel("the box on the left side of the bed") == "on the left of"
    assert find_rel("no spatial words here") == "none"


# ---------------- scan loading ----------------


def test_read_ply_roundtrip(fake_root):
    import os.path as osp

    d = read_ply(osp.join(
        fake_root, "scans", "scene0000_00", "scene0000_00_vh_clean_2.ply"
    ))
    assert d["x"].dtype == np.float32 and len(d["x"]) == 2000
    assert d["red"].dtype == np.uint8


def test_scan_objects_and_bbox(scans):
    scan = scans["scene0000_00"]
    assert scan.pc.shape == (2048, 3)
    assert len(scan.three_d_objects) == 3
    assert scan.get_object_instance_label(0) == "chair"
    bbox = scan.get_object_bbox(0)
    assert (bbox[3:] >= bbox[:3]).all()
    # object points live inside the bbox
    pc = scan.get_object_pc(0)
    assert (pc >= bbox[:3] - 1e-6).all() and (pc <= bbox[3:] + 1e-6).all()


# ---------------- augmentation ----------------


def test_rotations_orthonormal():
    rng = np.random.RandomState(0)
    pc = rng.randn(100, 3)
    for fn in (rot_x, rot_y, rot_z):
        out = fn(pc, 37.0)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.linalg.norm(pc, axis=1),
            rtol=1e-6,
        )
    # z-rotation by 90 deg maps +x to +y
    out = rot_z(np.array([[1.0, 0, 0]]), 90.0)
    np.testing.assert_allclose(out, [[0, 1, 0]], atol=1e-9)


def test_box_points_roundtrip():
    rng = np.random.RandomState(1)
    boxes = np.concatenate(
        [rng.randn(10, 3), rng.rand(10, 3) + 0.1], axis=1
    )
    np.testing.assert_allclose(points2box(box2points(boxes)), boxes,
                               atol=1e-9)


def test_transform_boxes_matches_pointcloud_transform():
    rng = np.random.RandomState(2)
    boxes = np.concatenate(
        [rng.randn(5, 3), rng.rand(5, 3) + 0.3], axis=1
    )
    pc = box2points(boxes).reshape(-1, 3)
    # rotate=False: no flips. (With flips on, the reference applies flips
    # BEFORE rotations for points but AFTER rotations for boxes
    # (joint_det_dataset.py:363-383 vs :595-605) — a quirk we reproduce, so
    # the two paths only agree in the flip-free case.)
    pc2, _, aug = augment_pointcloud(pc, None, rotate=False,
                                     rng=np.random.RandomState(3))
    got = transform_boxes(boxes, aug)
    # the box transform skips per-point noise; centers close, sizes close
    want = points2box(pc2.reshape(-1, 8, 3))
    np.testing.assert_allclose(got[:, :3], want[:, :3], atol=6e-3)
    np.testing.assert_allclose(got[:, 3:], want[:, 3:], atol=2e-2)


def test_augment_deterministic_given_seed():
    pc = np.random.RandomState(0).randn(50, 3)
    a1 = augment_pointcloud(pc, None, True, np.random.RandomState(7))
    a2 = augment_pointcloud(pc, None, True, np.random.RandomState(7))
    np.testing.assert_array_equal(a1[0], a2[0])


def test_native_augment_matches_numpy(monkeypatch):
    """The fused C++ pass and the sequential numpy path consume the SAME
    RNG stream and agree to f32 rounding (matmul association differs)."""
    from butd_detr_tpu.native import load_native

    if load_native() is None:
        pytest.skip("native lib unavailable")
    rng0 = np.random.RandomState(0)
    pc = rng0.randn(500, 3).astype(np.float32)
    color = rng0.rand(500, 3).astype(np.float32)
    for rotate in (False, True):
        for seed in (7, 8, 9):  # covers both flip branches
            monkeypatch.setenv("BUTD_NATIVE_AUGMENT", "1")
            p1, c1, a1 = augment_pointcloud(
                pc, color, rotate, np.random.RandomState(seed))
            monkeypatch.setenv("BUTD_NATIVE_AUGMENT", "0")
            p2, c2, a2 = augment_pointcloud(
                pc, color, rotate, np.random.RandomState(seed))
            assert a1.keys() == a2.keys()
            np.testing.assert_allclose(a1["shift"], a2["shift"])
            np.testing.assert_allclose(p1, p2, rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(c1, c2, rtol=2e-5, atol=2e-5)
            # input untouched (both paths copy)
            assert pc.dtype == np.float32 and len(pc) == 500


# ---------------- positive maps ----------------


def test_token_positive_map_simple_tokenizer():
    tok = SimpleTokenizer(max_len=64)
    spans, pmap = token_positive_map(
        tok, "the chair near the table", ["chair", "table"], max_num_obj=8
    )
    assert pmap.shape == (8, 256)
    # both objects got a normalized span
    assert pmap[0].sum() == pytest.approx(1.0)
    assert pmap[1].sum() == pytest.approx(1.0)
    assert pmap[2].sum() == 0.0
    # the two spans differ
    assert not np.array_equal(pmap[0], pmap[1])


def test_token_positive_map_multiword_and_fallbacks():
    tok = SimpleTokenizer(max_len=64)
    _, pmap = token_positive_map(
        tok, "a shower curtain . a toilet", ["shower curtain", "toilet"],
        max_num_obj=4,
    )
    assert pmap[0].sum() == pytest.approx(1.0)
    # multiword span covers 2 tokens -> each weighted 0.5
    assert pmap[0].max() == pytest.approx(0.5)


# ---------------- dataset / loader ----------------


def test_sr3d_dataset_sample_schema(fake_root, scans):
    ds = dataset(fake_root, scans, butd=True, augment_det=True)
    assert len(ds) == 2
    s = ds.get(0, np.random.RandomState(0))
    assert s["point_clouds"].shape == (2048, 3)
    assert s["center_label"].shape == (MAX_NUM_OBJ, 3)
    assert s["positive_map"].shape == (MAX_NUM_OBJ, 256)
    assert s["box_label_mask"].sum() == 1  # root only
    assert s["positive_map"][0].sum() == pytest.approx(1.0)
    assert s["point_instance_label"].max() == 0  # target instance marked
    assert s["det_bbox_label_mask"].sum() == 4
    assert s["is_hard"] is False and s["is_unique"] is False
    assert s["target_name"] == "chair"
    assert s["utterances"].endswith(" . not mentioned")
    # GT box covers the object's points (pre-jitter tolerance)
    gt_c, gt_s = s["center_label"][0], s["size_gts"][0]
    assert (gt_s > 0).all() and (gt_s < 2).all()


def test_configurable_max_num_obj_pads_narrow(fake_root, scans):
    """max_num_obj shrinks every box-shaped array from the reference's 132
    (the default) — used by small-scene configs and the test harness."""
    ds = dataset(fake_root, scans, butd=True, max_num_obj=8)
    s = ds.get(0, np.random.RandomState(0))
    assert s["center_label"].shape == (8, 3)
    assert s["size_gts"].shape == (8, 3)
    assert s["positive_map"].shape == (8, 256)
    assert s["box_label_mask"].shape == (8,)
    assert s["det_boxes"].shape == (8, 6)
    assert s["det_bbox_label_mask"].shape == (8,)
    assert s["all_bboxes"].shape == (8, 6)


def test_gt_boxes_live_in_augmented_frame(fake_root, scans):
    """Regression for the r1 training-correctness bug: GT/scene boxes must
    be AABBs of the AUGMENTED object points (reference re-assigns
    scan.pc = pc, joint_det_dataset.py:441-442, before get_object_bbox)."""
    ds = dataset(fake_root, scans)
    assert ds.augment
    anno = dict(ds.annos[0])
    scan = ds.scans[anno["scan_id"]]
    rng = np.random.RandomState(3)
    _, raw_pc, augs, _ = ds._get_pc(anno, scan, rng)
    assert augs  # augmentation record non-empty on the train split
    tid = anno["target_id"]
    pts = raw_pc[scan.three_d_objects[tid]["points"], :3]
    bbox = ds._object_bbox(scan, tid, raw_pc)
    np.testing.assert_allclose(bbox[:3], pts.min(axis=0))
    np.testing.assert_allclose(bbox[3:], pts.max(axis=0))
    # and it is NOT the un-augmented box
    assert not np.allclose(bbox, scan.get_object_bbox(tid), atol=1e-3)


def test_augmented_sample_box_contains_instance_points(fake_root, scans):
    """End-to-end: every GT object's points (per point_instance_label) lie
    inside its center_label/size_gts box, up to the reference's own ±5%
    box jitter (joint_det_dataset.py:516)."""
    ds = dataset(fake_root, scans)
    for seed in range(4):
        s = ds.get(0, np.random.RandomState(seed))
        pil = s["point_instance_label"]
        k = int(s["box_label_mask"].sum())
        assert k >= 1
        for t in range(k):
            pts = s["point_clouds"][pil == t, :3]
            assert len(pts) > 0
            c, sz = s["center_label"][t], s["size_gts"][t]
            # jitter scales all 6 box dims by U[0.95, 1.05]; bound the
            # displacement it can cause relative to the true AABB
            slack = 0.06 * (np.abs(c) + sz) + 1e-6
            assert (pts >= c - sz / 2 - slack).all(), (seed, t)
            assert (pts <= c + sz / 2 + slack).all(), (seed, t)


def test_use_color_and_height(fake_root, scans):
    ds = dataset(fake_root, scans, use_color=True, use_height=True)
    s = ds.get(0, np.random.RandomState(0))
    assert s["point_clouds"].shape == (2048, 7)
    # colors are mean-centered: bounded
    assert np.abs(s["point_clouds"][:, 3:6]).max() < 1.5


def test_butd_cls_uses_gt_boxes(fake_root, scans):
    ds = dataset(fake_root, scans, butd_cls=True)
    s = ds.get(0, np.random.RandomState(0))
    np.testing.assert_array_equal(s["det_boxes"], s["all_bboxes"])
    assert s["det_class_ids"][:3].tolist() == [1, 3, 1]


def test_scannet_detection_prompts(fake_root, scans):
    ds = dataset(
        fake_root, scans, dataset_dict={"sr3d": 1, "scannet": 2},
    )
    # 2 sr3d + 2 scans x 2 reps
    assert len(ds) == 6
    scannet_idx = next(
        i for i, a in enumerate(ds.annos) if a["dataset"] == "scannet"
    )
    s = ds.get(scannet_idx, np.random.RandomState(1))
    # all three objects are 18-class targets (chair/table) OR random utt
    assert s["box_label_mask"].sum() >= 1
    assert s["positive_map"][:3].sum() > 0


def test_text_len_overflow_fails_loudly(fake_root, scans):
    """A positive-map span past max_text_len must raise (it would silently
    vanish from the contrastive loss and cross-attention otherwise), and a
    large enough budget keeps every span."""
    ds_small = dataset(
        fake_root, scans, dataset_dict={"sr3d": 1, "scannet": 2},
        max_text_len=8,
    )
    scannet_idx = next(
        i for i, a in enumerate(ds_small.annos) if a["dataset"] == "scannet"
    )
    with pytest.raises(ValueError, match="max_text_len"):
        ds_small.get(scannet_idx, np.random.RandomState(0))

    ds_big = dataset(
        fake_root, scans, dataset_dict={"sr3d": 1, "scannet": 2},
        max_text_len=256,
    )
    s = ds_big.get(scannet_idx, np.random.RandomState(0))
    assert s["positive_map"].sum() > 0


def test_config_joint_det_bumps_text_len():
    from butd_detr_tpu.train.config import Config

    assert Config().max_text_len == 64
    assert Config(joint_det=True).max_text_len == 128
    assert Config(joint_det=True, max_text_len=192).max_text_len == 192


def test_val_split_no_augment(fake_root, scans):
    ds = dataset(fake_root, scans, split="val", test_dataset="sr3d")
    s1 = ds.get(0, np.random.RandomState(0))
    s2 = ds.get(0, np.random.RandomState(99))
    np.testing.assert_array_equal(s1["point_clouds"], s2["point_clouds"])


def test_dataloader_batching_and_sharding(fake_root, scans):
    ds = dataset(fake_root, scans)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=3)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["point_clouds"].shape == (2, 2048, 3)
    assert b["text_ids"].shape[0] == 2
    assert isinstance(b["utterances"], list)
    # sharding: two processes each see half the data
    d0 = DataLoader(ds, batch_size=1, shuffle=False, process_index=0,
                    process_count=2)
    d1 = DataLoader(ds, batch_size=1, shuffle=False, process_index=1,
                    process_count=2)
    assert len(d0) == 1 and len(d1) == 1
    b0, b1 = next(iter(d0)), next(iter(d1))
    assert b0["scan_ids"] != b1["scan_ids"]


def test_dataloader_deterministic_same_epoch(fake_root, scans):
    ds = dataset(fake_root, scans)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=5)
    b1 = next(iter(dl))
    b2 = next(iter(dl))
    np.testing.assert_array_equal(b1["point_clouds"], b2["point_clouds"])
    dl.set_epoch(1)
    b3 = next(iter(dl))
    assert not np.array_equal(b1["point_clouds"], b3["point_clouds"])


def test_scan_cache_roundtrip(fake_root, scans, tmp_path):
    """prepare_data flow: save_scan_cache pickles a split, load_scan_cache
    restores Scans identical to direct loads (reference save_data,
    joint_det_dataset.py:1000-1029)."""
    import os.path as osp

    from butd_detr_tpu.data.scan import load_scan_cache, save_scan_cache

    path = str(tmp_path / "train_v3scans.pkl")
    save_scan_cache(path, "train", fake_root, num_workers=1,
                    keep_points=2048)
    loaded = load_scan_cache(path, osp.join(fake_root, "meta_data"))
    assert set(loaded) == set(scans)
    for sid, scan in scans.items():
        np.testing.assert_array_equal(loaded[sid].orig_pc, scan.orig_pc)
        np.testing.assert_array_equal(loaded[sid].color, scan.color)
        assert len(loaded[sid].three_d_objects) == len(scan.three_d_objects)


def test_dataset_builds_scan_cache_on_demand(fake_root, tmp_path):
    """scans=None (the production train.py path): the dataset builds
    {split}_v3scans.pkl on demand, loads it, and serves samples
    (joint_dataset.py:143-151 <- reference save_data on-demand build)."""
    import os.path as osp
    import shutil

    root = str(tmp_path / "root")
    shutil.copytree(fake_root, root)
    ds = JointGroundingDataset(
        split="train", dataset_dict={"sr3d": 1}, test_dataset="sr3d",
        data_path=root, tokenizer=SimpleTokenizer(max_len=32),
        butd_cls=True, max_text_len=32, max_num_obj=8,
    )
    assert osp.exists(osp.join(root, "train_v3scans.pkl"))
    s = ds.get(0, np.random.RandomState(0))
    assert s["center_label"].shape == (8, 3)


def test_loader_spawn_workers(fake_root, scans):
    """Worker processes must use spawn (fork after JAX init can deadlock)
    and must not touch the JAX backend — this test hangs if either breaks
    when no accelerator is reachable."""
    ds = dataset(fake_root, scans, butd_cls=True, max_num_obj=8)
    loader = DataLoader(ds, batch_size=2, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["center_label"].shape == (2, 8, 3)
    # same seeds => same samples as the serial loader
    serial = list(DataLoader(ds, batch_size=2, seed=0, num_workers=0))
    np.testing.assert_array_equal(
        b["point_clouds"], serial[0]["point_clouds"]
    )


def test_narrow_pad_truncates_instead_of_crashing(fake_root, scans):
    """Narrow max_num_obj must TRUNCATE (reference 132 always fits):
    detected boxes past max_det_boxes, target ids and pred-span rows past
    max_num_obj all clip instead of asserting/broadcast-erroring."""
    # fake scans carry 4 detected boxes; max_det_boxes=2 must truncate
    ds = dataset(fake_root, scans, butd=True, max_num_obj=8,
                 max_det_boxes=2)
    s = ds.get(0, np.random.RandomState(0))
    assert s["det_boxes"].shape == (2, 6)
    assert s["det_bbox_label_mask"].sum() == 2
    # GT pads keep max_num_obj width
    assert s["center_label"].shape == (8, 3)
    assert s["positive_map"].shape == (8, 256)


def test_max_det_boxes_widens_independently(fake_root, scans):
    """max_det_boxes controls the det stream separately from the GT pad,
    including the butd_cls branch that copies GT boxes into it."""
    ds = dataset(fake_root, scans, butd_cls=True, max_num_obj=8,
                 max_det_boxes=16)
    s = ds.get(0, np.random.RandomState(0))
    assert s["det_boxes"].shape == (16, 6)
    assert s["det_bbox_label_mask"].shape == (16,)
    assert s["center_label"].shape == (8, 3)
    # copied GT boxes survive the width change
    k = int(s["box_label_mask"].sum())
    np.testing.assert_array_equal(
        s["det_boxes"][:k], s["all_bboxes"][:k]
    )


# ---------------- nr3d / sr3d+ / scanrefer / multiview loaders ----------------
# (reference joint_det_dataset.py:163-278,341-356 — round-2 VERDICT item 3)


def test_nr3d_loader_train(fake_root, scans):
    """nr3d CSV loader: mentions_target_class filter, distractors computed
    from same-instance-label scene objects (joint_det_dataset.py:163-210)."""
    ds = dataset(fake_root, scans, dataset_dict={"nr3d": 1})
    # fixture: 3 rows/scan — kept, mentions=False (dropped), correct=False
    # (kept at train; the correct_guess filter applies only at val/test)
    assert len(ds) == 4
    assert all(a["dataset"] == "nr3d" for a in ds.annos)
    a = ds.annos[0]
    assert a["target_id"] == 0 and a["target"] == "chair"
    # the other chair (object 2) is the sole distractor of target 0
    assert a["distractor_ids"] == [2]
    s = ds.get(0, np.random.RandomState(0))
    assert s["point_clouds"].shape == (2048, 3)
    assert s["positive_map"][0].sum() == pytest.approx(1.0)
    assert s["target_name"] == "chair"


def test_nr3d_loader_val_filters_correct_guess(fake_root, scans):
    """At val (mapped to the nr3d 'test' scan list) rows with
    correct_guess=False are dropped (joint_det_dataset.py:193-197)."""
    ds = dataset(
        fake_root, scans, dataset_dict={"nr3d": 1},
        test_dataset="nr3d", split="val",
    )
    assert len(ds) == 2  # only the fully-true row per scan survives


def test_sr3dplus_loader(fake_root, scans):
    """sr3d+ shares the sr3d loader/span file but reads sr3d+.csv
    (joint_det_dataset.py:126-129); fixture csv = sr3d rows + extras."""
    ds = dataset(fake_root, scans, dataset_dict={"sr3d+": 1})
    assert len(ds) == 4
    assert all(a["dataset"] == "sr3d+" for a in ds.annos)
    # extra rows target the second chair with the first as distractor
    assert ds.annos[2]["target_id"] == 2
    assert ds.annos[2]["distractor_ids"] == [0]
    s = ds.get(2, np.random.RandomState(0))
    assert s["target_id"] == 2
    assert s["box_label_mask"].sum() == 1
    # GT box is the augmented AABB of object 2's points
    pil = s["point_instance_label"]
    assert (pil == 0).sum() > 0


def test_scanrefer_loader(fake_root, scans):
    """ScanRefer JSON loader: token-joined utterance, 18-class distractors,
    unique flag (joint_det_dataset.py:212-278)."""
    ds = dataset(fake_root, scans, dataset_dict={"scanrefer": 1})
    assert len(ds) == 2
    a = ds.annos[0]
    assert a["dataset"] == "scanrefer"
    assert a["utterance"] == "the table in the room"
    assert a["target"] == "table"
    # sole table in the scene: no distractors, unique
    assert a["distractor_ids"] == []
    assert bool(a["unique"])
    s = ds.get(0, np.random.RandomState(0))
    assert s["is_unique"] is True and s["is_hard"] is False
    assert s["target_name"] == "table"
    assert s["utterances"].startswith("the table in the room")


def test_scanrefer_val_split_uses_val_files(fake_root, scans):
    ds = dataset(
        fake_root, scans, dataset_dict={"scanrefer": 1},
        test_dataset="scanrefer", split="val",
    )
    assert len(ds) == 2
    s = ds.get(0, np.random.RandomState(0))
    assert s["point_clouds"].shape == (2048, 3)


def test_multiview_features_concatenated(fake_root, scans):
    """use_multiview appends the per-point hdf5 features AFTER xyz+color
    and they are NOT geometrically augmented (reference _get_pc,
    joint_det_dataset.py:425-450)."""
    from butd_detr_tpu.data.synthetic import make_fake_multiview

    make_fake_multiview(fake_root, scans, dim=32, seed=3)
    ds = dataset(
        fake_root, scans, dataset_dict={"sr3d": 1},
        use_color=True, use_multiview=True,
    )
    s = ds.get(0, np.random.RandomState(0))
    assert s["point_clouds"].shape == (2048, 3 + 3 + 32)
    # multiview block is the raw hdf5 content (no augmentation applied)
    import h5py
    import os.path as osp

    with h5py.File(
        osp.join(fake_root, "scanrefer_2d_feats", "enet_feats_maxpool.hdf5")
    ) as f:
        raw = np.asarray(f[ds.annos[0]["scan_id"]])
    np.testing.assert_allclose(s["point_clouds"][:, 6:], raw, rtol=1e-6)


def test_all_five_loaders_mix_in_joint_train(fake_root, scans):
    """Joint training mixes every annotation source with repetition counts
    (reference train_dist_mod.py:44-45; loaders :112-310)."""
    from butd_detr_tpu.data.synthetic import make_fake_multiview

    make_fake_multiview(fake_root, scans, dim=8)
    ds = dataset(
        fake_root, scans,
        dataset_dict={
            "sr3d": 1, "sr3d+": 1, "nr3d": 1, "scanrefer": 1, "scannet": 2
        },
    )
    counts = {}
    for a in ds.annos:
        counts[a["dataset"]] = counts.get(a["dataset"], 0) + 1
    assert counts == {
        "sr3d": 2, "sr3d+": 4, "nr3d": 4, "scanrefer": 2, "scannet": 4
    }
    # joint_det flips on (scannet + another dataset at train)
    assert ds.joint_det
    for i in (0, 3, 7, 9, 13):
        s = ds.get(i, np.random.RandomState(i))
        assert s["point_clouds"].shape == (2048, 3)
        assert np.isfinite(s["point_clouds"]).all()


def test_loader_pads_tail_batch_with_valid_marker():
    """drop_last=False: the final short batch is padded to the fixed batch
    shape by cyclic repetition (fixed-shape TPU executables can't take a
    ragged tail) and carries __valid__ = number of real rows; full batches
    carry no marker. The harness eval loop truncates end_points back to
    __valid__ rows so evaluator counters stay exact."""
    from butd_detr_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def get(self, i, rng):
            return {"x": np.full((3,), i, np.float32), "scan_ids": f"s{i}"}

    dl = DataLoader(DS(), batch_size=4, shuffle=False, drop_last=False,
                    num_workers=0)
    batches = list(dl)
    assert len(batches) == len(dl) == 3
    assert "__valid__" not in batches[0] and "__valid__" not in batches[1]
    tail = batches[2]
    assert tail.pop("__valid__") == 2
    assert tail["x"].shape == (4, 3)
    # cyclic repetition: rows 2,3 repeat rows 0,1 (= samples 8, 9)
    np.testing.assert_array_equal(tail["x"][2:], tail["x"][:2])
    assert [int(v[0]) for v in tail["x"]] == [8, 9, 8, 9]

    # drop_last=True unchanged: tail dropped, no markers
    dl2 = DataLoader(DS(), batch_size=4, shuffle=False, drop_last=True,
                     num_workers=0)
    batches2 = list(dl2)
    assert len(batches2) == 2
    assert all("__valid__" not in b for b in batches2)


def test_scan_points_stored_in_hilbert_order(scans):
    """The data pipeline stores each subsampled cloud in Hilbert order
    (Scan.load_point_cloud spatial_sort): codes are non-decreasing and
    per-point arrays (color/label/object point indices) stay aligned
    through the folded `choices` permutation."""
    from butd_detr_tpu.data.scan import Scan, hilbert_code

    scan = next(iter(scans.values()))
    code = hilbert_code(scan.pc)
    assert (np.diff(code) >= 0).all(), "cloud not in Hilbert order"
    assert len(scan.color) == len(scan.pc) == len(scan.choices)
    # object point indices index the sorted cloud: object AABB from those
    # rows must tightly contain the object's sampled points
    for o in scan.three_d_objects:
        if len(o["points"]) == 0:
            continue
        pts = scan.pc[o["points"], :3]
        assert np.isfinite(pts).all()
    # opt-out keeps the reference's random subsample order (same SET of
    # rows, different order)
    unsorted = Scan(
        scan.scan_id, scan.top_scan_dir, False,
        mappings=scan.mappings, keep_points=len(scan.pc),
        spatial_sort=False,
    )
    assert sorted(unsorted.choices.tolist()) == sorted(
        scan.choices.tolist()
    )
    assert not (unsorted.choices == scan.choices).all()
