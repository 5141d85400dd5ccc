#!/usr/bin/env python
"""Train / evaluate BUTD-DETR-TPU (language grounding on point clouds).

TPU-native entry point replacing the reference's
`python -m torch.distributed.launch train_dist_mod.py ...`
(train_dist_mod.py:281-291): no launcher needed — JAX discovers the local
chips; multi-host SPMD runs one process per host (jax.distributed), and
the dp mesh + pjit handle all communication.

Examples (same flags as the reference, main_utils.py:31-119):
  python train.py --dataset sr3d --test_dataset sr3d --use_color \
      --use_soft_token_loss --use_contrastive_align --self_attend \
      --butd_cls --lr_decay_epochs 30 35
  python train.py --eval --checkpoint_path log/ckpt_epoch_40 ...
"""

import os


def main():
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

    from butd_detr_tpu.train import TrainTester, parse_config

    cfg = parse_config()
    TrainTester(cfg).main()


if __name__ == "__main__":
    main()
