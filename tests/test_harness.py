"""End-to-end harness test: tiny model + fake on-disk ScanNet + real
TrainTester loop (train epochs, checkpoint, grounding eval) on the CPU
mesh. This is the integration test the reference lacks entirely
(SURVEY.md section 4)."""

import os.path as osp

import numpy as np
import pytest

from butd_detr_tpu.data import JointGroundingDataset
from butd_detr_tpu.data.scan import load_scans_parallel
from butd_detr_tpu.data.synthetic import make_fake_scannet
from butd_detr_tpu.lang import tiny_roberta_config
from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
from butd_detr_tpu.train import Config, TrainTester, detection_token_map
from butd_detr_tpu.train.step import build_model


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_harness")
    return make_fake_scannet(
        str(root),
        scan_ids=[f"scene{i:04d}_00" for i in range(8)],
        points_per_scan=1500,
    )


class TinyTrainTester(TrainTester):
    """Production harness wired to a tiny model + tiny scans.

    Shapes/config deliberately MATCH tests/test_train_step.tiny_setup so
    the train-step HLO is identical and its XLA:CPU compile — the single
    largest cost of a cold suite run — is paid once (persistent cache)."""

    KEEP_POINTS = 256

    def __init__(self, cfg, fake_root):
        self._root = fake_root
        super().__init__(cfg)

    def get_datasets(self):
        cfg = self.cfg
        with open(
            osp.join(self._root, "meta_data", "scannetv2_train.txt")
        ) as f:
            ids = [l.strip() for l in f if l.strip()]
        scans = load_scans_parallel(
            ids, osp.join(self._root, "scans"),
            osp.join(self._root, "meta_data"),
            num_workers=1, keep_points=self.KEEP_POINTS,
        )
        tok = SimpleTokenizer(max_len=cfg.max_text_len)
        common = dict(
            dataset_dict={d: 1 for d in cfg.dataset},
            test_dataset=cfg.test_dataset,
            data_path=self._root, scans=scans, tokenizer=tok,
            use_color=cfg.use_color, butd=cfg.butd, butd_gt=cfg.butd_gt,
            butd_cls=cfg.butd_cls, max_text_len=cfg.max_text_len,
            max_num_obj=cfg.max_num_obj,
        )
        return (
            JointGroundingDataset(split="train", **common),
            JointGroundingDataset(split="val", **common),
        )

    def get_model(self):
        return build_model(
            self.cfg,
            roberta_config=tiny_roberta_config(),
            backbone_npoints=(64, 32, 16, 8),
        )


def tiny_config(tmp_path, **kw):
    kw.setdefault("dataset", ["sr3d"])
    kw.setdefault("test_dataset", "sr3d")
    return Config(
        # Every graph-shaping field below matches test_train_step.tiny_setup
        # (B=8 over dp=8, 256 points, 6-channel clouds, text 12, 16
        # queries, 1 enc + 1 dec layer, 8-wide box pads): identical config
        # -> identical train-step HLO -> one XLA:CPU compile for the whole
        # suite via the persistent cache.
        batch_size=8,
        num_encoder_layers=1,
        num_decoder_layers=1,
        num_target=16,
        max_text_len=12,
        num_points=256,
        use_color=True,
        max_num_obj=8,
        max_det_boxes=8,
        use_soft_token_loss=True,
        use_contrastive_align=True,
        self_attend=True,
        max_epoch=1,
        val_freq=1,
        print_freq=1,
        num_workers=0,
        dp=8,
        log_dir=str(tmp_path / "log"),
        **kw,
    )


@pytest.mark.heavy
def test_train_eval_checkpoint_cycle(fake_root, tmp_path):
    """Full TrainTester integration (train -> ckpt -> resume -> eval).
    Heavy tier: ~2.5 min on this single-core container even with the
    persistent compile cache. Default-tier coverage of the pieces:
    train/eval steps on the dp mesh (test_train_step.mesh_run), orbax
    save/restore (test_checkpoint_save_restore_roundtrip), evaluators
    (test_eval.py), dataset/loader (test_data.py)."""
    cfg = tiny_config(
        tmp_path, butd_cls=True,
        profile_dir=str(tmp_path / "trace"), profile_steps=1,
    )
    tt = TinyTrainTester(cfg, fake_root)
    state = tt.main()  # 1 epoch train + checkpoint + GT eval
    assert int(state.step) == 1  # 8 samples / batch 8
    assert osp.isdir(osp.join(cfg.log_dir, "ckpt_epoch_1"))
    # jax.profiler hook wrote a TensorBoard-viewable trace
    import glob

    assert glob.glob(
        osp.join(cfg.profile_dir, "**", "*.xplane.pb"), recursive=True
    ), "no profiler trace written"

    # resume-from-checkpoint eval path
    cfg2 = tiny_config(
        tmp_path, butd_cls=True, eval=True,
        checkpoint_path=osp.join(cfg.log_dir, "ckpt_epoch_1"),
    )
    tt2 = TinyTrainTester(cfg2, fake_root)
    state2 = tt2.main()
    np.testing.assert_allclose(
        np.asarray(state.step), np.asarray(state2.step)
    )


@pytest.mark.heavy
def test_grounding_eval_det_setup(fake_root, tmp_path):
    cfg = tiny_config(tmp_path, butd=True)
    tt = TinyTrainTester(cfg, fake_root)
    train_loader, test_loader = tt.get_loaders()
    import jax

    from butd_detr_tpu.parallel import make_mesh
    from butd_detr_tpu.train import (
        init_state, make_eval_step, make_optimizer, shard_eval_step,
    )

    mesh = make_mesh(dp=cfg.dp, mp=cfg.mp)
    model = tt.get_model()
    optimizer = make_optimizer(cfg, steps_per_epoch=2)
    state = init_state(
        model, optimizer, next(iter(test_loader)), jax.random.PRNGKey(0)
    )
    eval_step = shard_eval_step(make_eval_step(model, cfg), mesh)
    ev = tt.evaluate_one_epoch(1, test_loader, eval_step, state, mesh)
    # untrained model: accuracies exist and are in [0, 1]
    acc = ev.accuracy("last_", 0.25, 10, "bbs")
    assert 0.0 <= acc <= 1.0


def test_detection_token_map_simple_tokenizer():
    tok = SimpleTokenizer(max_len=256)
    wordidx, tokenidx = detection_token_map(tok)
    assert len(wordidx) == len(tokenidx)
    # 18 classes + not-mentioned all covered
    assert set(wordidx) == set(range(19))
    # token indices strictly increasing within the prompt
    assert (np.diff(tokenidx) > 0).all()


@pytest.mark.heavy
def test_detection_eval_on_scannet_prompt(fake_root, tmp_path):
    """evaluate_one_epoch_det end-to-end: scannet test_dataset routes to
    the detection mAP path (token->class projection + NMS + VOC AP)."""
    import jax

    from butd_detr_tpu.parallel import make_mesh
    from butd_detr_tpu.train import (
        init_state, make_eval_step, make_optimizer, shard_eval_step,
    )

    cfg = tiny_config(
        tmp_path, butd=True, dataset=["scannet"], test_dataset="scannet",
    )
    tt = TinyTrainTester(cfg, fake_root)
    _, test_loader = tt.get_loaders()
    mesh = make_mesh(dp=cfg.dp, mp=cfg.mp)
    model = tt.get_model()
    optimizer = make_optimizer(cfg, steps_per_epoch=2)
    state = init_state(
        model, optimizer, next(iter(test_loader)), jax.random.PRNGKey(0)
    )
    eval_step = shard_eval_step(
        make_eval_step(model, cfg, with_loss=False), mesh
    )
    results = tt.evaluate_one_epoch(1, test_loader, eval_step, state, mesh)
    for t in cfg.ap_iou_thresholds:
        assert 0.0 <= results[t]["mAP"] <= 1.0
        assert 0.0 <= results[t]["AR"] <= 1.0
