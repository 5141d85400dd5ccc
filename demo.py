"""Self-contained quickstart: synthetic mini-ScanNet -> train -> predict.

No real ScanNet download needed — generates a fake-but-schema-exact
dataset, trains the tiny configuration for one epoch through the real
TrainTester (sharded jitted step, checkpointing, grounding eval), then
grounds an utterance with the inference API. Runs on CPU (virtual
8-device mesh) or a real TPU.

    python demo.py --platform cpu        # anywhere, ~2-4 min
    python demo.py                       # on a TPU host
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"])
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--epochs", type=int, default=1)
    args = parser.parse_args(argv)

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from butd_detr_tpu.data.scan import Scan
    from butd_detr_tpu.data.synthetic import make_fake_scannet
    from butd_detr_tpu.lang import tiny_roberta_config
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
    from butd_detr_tpu.predict import GroundingPredictor
    from butd_detr_tpu.train import Config, TrainTester
    from butd_detr_tpu.train.step import build_model

    work = args.workdir or tempfile.mkdtemp(prefix="butd_demo_")
    data_root = osp.join(work, "data")
    print(f"[demo] workdir: {work}")
    make_fake_scannet(
        data_root,
        scan_ids=[f"scene{i:04d}_00" for i in range(8)],
        points_per_scan=1500,
    )

    cfg = Config(
        dataset=["sr3d"], test_dataset="sr3d", data_root=data_root,
        batch_size=8, dp=min(8, len(jax.devices())),
        num_encoder_layers=1, num_decoder_layers=1, num_target=16,
        max_text_len=12, num_points=256, use_color=True,
        max_num_obj=8, max_det_boxes=8,
        use_soft_token_loss=True, use_contrastive_align=True,
        self_attend=True, butd_cls=True,
        max_epoch=args.epochs, val_freq=args.epochs, print_freq=1,
        num_workers=0, log_dir=osp.join(work, "log"),
    )

    class DemoTrainTester(TrainTester):
        KEEP_POINTS = 256

        def get_datasets(self):
            from butd_detr_tpu.data import JointGroundingDataset
            from butd_detr_tpu.data.scan import load_scans_parallel

            with open(
                osp.join(data_root, "meta_data", "scannetv2_train.txt")
            ) as f:
                ids = [line.strip() for line in f if line.strip()]
            scans = load_scans_parallel(
                ids, osp.join(data_root, "scans"),
                osp.join(data_root, "meta_data"),
                num_workers=1, keep_points=self.KEEP_POINTS,
            )
            tok = SimpleTokenizer(max_len=cfg.max_text_len)
            common = dict(
                dataset_dict={"sr3d": 1}, test_dataset="sr3d",
                data_path=data_root, scans=scans, tokenizer=tok,
                use_color=True, butd_cls=True,
                max_text_len=cfg.max_text_len,
                max_num_obj=cfg.max_num_obj,
            )
            return (
                JointGroundingDataset(split="train", **common),
                JointGroundingDataset(split="val", **common),
            )

        def get_model(self):
            return build_model(
                cfg, roberta_config=tiny_roberta_config(),
                backbone_npoints=(64, 32, 16, 8),
            )

    print("[demo] training ...")
    tt = DemoTrainTester(cfg)
    state = tt.main()
    print(f"[demo] trained {int(state.step)} steps; "
          f"checkpoint in {cfg.log_dir}")

    print("[demo] inference ...")
    scan = Scan("scene0000_00", osp.join(data_root, "scans"),
                meta_dir=osp.join(data_root, "meta_data"),
                keep_points=256)
    cloud = np.concatenate([scan.orig_pc, scan.color], axis=1)
    pred = GroundingPredictor(
        cfg, {"params": state.params, "batch_stats": state.batch_stats},
        SimpleTokenizer(max_len=cfg.max_text_len),
        roberta_config=tiny_roberta_config(),
        backbone_npoints=(64, 32, 16, 8),
    )
    out = pred.predict(
        cloud, "the chair near the table", phrase="chair", top_k=3,
    )
    print("[demo] top boxes (cxcyczwhd):")
    print(json.dumps({
        "boxes": np.round(out["boxes"], 3).tolist(),
        "scores": np.round(out["scores"], 4).tolist(),
    }, indent=2))
    print("[demo] OK")


if __name__ == "__main__":
    sys.exit(main())
