"""CLI inference: ground an utterance to 3D boxes in a ScanNet scene.

The reference repo has no inference entry point — predictions only exist
inside its evaluation loops. Here:

    python predict.py --checkpoint_path log/ckpt_epoch_30 \
        --data_path ~/scannet --scan_id scene0025_00 \
        --utterance "the chair near the table" --phrase chair

prints the top-k grounded boxes as one JSON object. `--checkpoint_path`
accepts an orbax directory (native) or a reference `.pth` file (via the
torch converter). Model flags (--butd, --use_color, ...) use the
reference-compatible names from train/config.py.
"""

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force a JAX backend (must be set before any jax use; in "
             "images whose sitecustomize preloads a TPU plugin, env vars "
             "alone are too late — this flag uses jax.config instead)")
    pre, _ = parser.parse_known_args(argv)
    if pre.platform:
        import jax

        jax.config.update("jax_platforms", pre.platform)

    from butd_detr_tpu.lang import get_tokenizer, roberta_base_config
    from butd_detr_tpu.predict import GroundingPredictor
    from butd_detr_tpu.train.config import parse_config
    parser.add_argument("--scan_id", required=True)
    parser.add_argument("--utterance", required=True)
    parser.add_argument("--phrase", default=None,
                        help="target phrase inside the utterance "
                             "(default: the whole utterance)")
    parser.add_argument("--mode", default="bbf", choices=["bbf", "bbs"])
    parser.add_argument("--top_k", type=int, default=10)
    parser.add_argument("--backbone_npoints", type=int, nargs=4,
                        default=(2048, 1024, 512, 256),
                        help="SA sampling schedule (small scenes/tests)")
    parser.add_argument("--tiny_roberta", action="store_true",
                        help="tiny random-vocab text trunk (tests)")
    args, rest = parser.parse_known_args(argv)
    cfg = parse_config(rest)

    from butd_detr_tpu.data.scan import Scan

    scan = Scan(args.scan_id, f"{cfg.data_root}/scans",
                meta_dir=f"{cfg.data_root}/meta_data")
    import numpy as np

    cloud = np.concatenate([scan.orig_pc, scan.color], axis=1)

    if args.tiny_roberta:
        from butd_detr_tpu.lang import tiny_roberta_config
        from butd_detr_tpu.lang.tokenizer import SimpleTokenizer

        roberta = tiny_roberta_config()
        tokenizer = SimpleTokenizer(max_len=cfg.max_text_len)
    else:
        roberta = roberta_base_config()
        tokenizer = get_tokenizer(max_len=cfg.max_text_len)
    pred = GroundingPredictor.from_checkpoint(
        cfg, cfg.checkpoint_path, tokenizer,
        roberta_config=roberta,
        backbone_npoints=tuple(args.backbone_npoints),
    )
    out = pred.predict(
        cloud, args.utterance, phrase=args.phrase,
        mode=args.mode, top_k=args.top_k,
    )
    print(json.dumps({
        "scan_id": args.scan_id,
        "utterance": args.utterance,
        "phrase": args.phrase,
        "mode": args.mode,
        "boxes_cxcyczwhd": out["boxes"].tolist(),
        "scores": out["scores"].tolist(),
    }))


if __name__ == "__main__":
    sys.exit(main())
