#!/usr/bin/env python
"""Train / evaluate / store the span predictor (side pipeline).

TPU-native entry point replacing the reference's `python src/text_cls.py`
(text_cls.py:409-456). `--store` writes `{dataset}_pred_spans.json`, the
predicted-span file consumed by the main grounding dataset.
"""

import argparse
import os


def main():
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", default="checkpoints/")
    parser.add_argument("--checkpoint", default="sr3d.msgpack")
    parser.add_argument("--dataset", default="sr3d")
    parser.add_argument("--data_root", default="./")
    parser.add_argument("--epochs", default=20, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--max_len", default=128, type=int)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--store", action="store_true")
    args = parser.parse_args()

    from butd_detr_tpu.lang.span_trainer import run_span_training

    run_span_training(args)


if __name__ == "__main__":
    main()
