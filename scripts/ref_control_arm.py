"""Reference-torch control arm for the butd_cls accuracy study (VERDICT
r3 weak #4 / next #1 fallback).

Runs the REFERENCE'S OWN training system — its BeaUTyDETR
(/root/reference/models/bdetr.py), its HungarianMatcher/SetCriterion/
compute_hungarian_loss (models/losses.py), its 3-group AdamW recipe
(main_utils.py:255-284) — on the IDENTICAL synthetic dataset the JAX
study trains on (scripts/accuracy_study.py --butd_cls --joint_det), with
the CUDA extension stubbed to CPU (tests/golden/ref_torch_stub.py) and
the same random-init-RoBERTa handicap (trainable, lr 1e-4, like the
study's --trainable_text).

Purpose: attribution. If the reference's matched-query soft-token argmax
stays pinned on the no-object bin (255) for as long as ours does on the
same data, the eos plateau is a property of the TASK at this scale, not
a defect in the TPU rebuild. If the reference cracks it quickly, we have
a bug signal.

Probe metrics every --probe_freq steps (mirrors scripts/diag_grounding.py
so curves are directly comparable): matched-CE vs eos-CE, matched argmax
bin distribution, p_span mass, and cls exact-match hit rate on a fixed
unaugmented train-scene batch.

Runs on host CPU — safe to run concurrently with a chip-resident study.

Usage:
  python scripts/ref_control_arm.py --data /root/repo/.study_cls/data \
      --steps 600 --batch 24 --out /root/repo/.study_cls/ref_control
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
# the stub bridges FPS/BQ to JAX; force CPU through jax.config (the image
# preloads jax with the axon TPU platform, env vars alone are too late —
# a "CPU" control run must never become a second TPU client)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


from scripts.probe_common import build_dataset  # noqa: E402


class SimpleTokWrapper:
    """Expose SimpleTokenizer through the HF batch_encode_plus surface the
    reference model tokenizes with in-forward (bdetr.py:164-167), so token
    POSITIONS match the positive maps our dataset built with the same
    tokenizer."""

    def __init__(self, tok):
        self.tok = tok

    def batch_encode_plus(self, texts, **kw):
        import torch

        from tests.golden.ref_torch_stub import FakeBatchEncoding

        out = self.tok(texts)
        # trim to the longest real sequence (reference pads 'longest')
        L = int(out.attention_mask.sum(1).max())
        return FakeBatchEncoding(
            torch.from_numpy(out.ids[:, :L]).long(),
            torch.from_numpy(out.attention_mask[:, :L]).long(),
        )


def probe(model, batch_np, step, out_path):
    """Eval-mode forward on a fixed batch; metrics via the shared
    scripts/probe_common.probe_row so curves are comparable with the JAX
    arm (scripts/overfit_probe.py) by construction."""
    import numpy as np
    import torch

    from scripts.probe_common import append_row, probe_row

    model.eval()
    tb = {k: torch.as_tensor(v) for k, v in batch_np.items()
          if hasattr(v, "dtype")}
    inputs = {
        "point_clouds": tb["point_clouds"].float(),
        "text": list(batch_np["utterances"]),
        "det_boxes": tb["all_detected_boxes"].float(),
        "det_bbox_label_mask": tb["all_detected_bbox_label_mask"].bool(),
        "det_class_ids": tb["all_detected_class_ids"].long(),
    }
    with torch.no_grad():
        ep = model(inputs)
    preds = {
        prefix: (
            ep[f"{prefix}sem_cls_scores"].float().numpy(),
            np.concatenate(
                [ep[f"{prefix}center"].float().numpy(),
                 ep[f"{prefix}pred_size"].float().numpy()], -1,
            ),
        )
        for prefix in ("proposal_", "last_")
    }
    row = probe_row(preds, batch_np, step)
    model.train()
    append_row(row, out_path)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/repo/.study_cls/data")
    ap.add_argument("--out", default="/root/repo/.study_cls/ref_control")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--num_points", type=int, default=50000)
    ap.add_argument("--probe_freq", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr_backbone", type=float, default=1e-3)
    ap.add_argument("--lr_text", type=float, default=1e-4,
                    help="the study's --trainable_text rate (the reference "
                    "freezes a PRETRAINED trunk; random-frozen would be a "
                    "handicap the reference never had)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small_text", action="store_true",
                    help="use the study's --small_text trunk (4 layers x "
                    "128-d, lang.small_text_roberta_config) instead of the "
                    "random-init roberta-base shape, so the text handicap "
                    "matches the r4b/r5 study arms exactly")
    ap.add_argument("--overfit", type=int, default=0,
                    help="single-batch overfit probe (VERDICT r4 weak #8): "
                    "train on ONE fixed unaugmented batch of the first N "
                    "train-scene samples and probe on that same batch. The "
                    "discriminating question: does the reference's matched "
                    "soft-token argmax escape the no-object bin (255) under "
                    "pure memorization? Run scripts/overfit_probe.py with "
                    "identical settings for the JAX arm.")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    with open(osp.join(args.out, "invocation.json"), "w") as f:
        json.dump({"argv": sys.argv, "args": vars(args)}, f, indent=1)

    import numpy as np
    import torch

    torch.manual_seed(args.seed)
    torch.set_num_threads(os.cpu_count() or 1)
    # reference losses.py:532-534 calls dist.get_world_size()
    # unconditionally — give it a 1-process gloo group
    import torch.distributed as dist

    if not dist.is_initialized():
        os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
        os.environ.setdefault("MASTER_PORT", "29512")
        dist.init_process_group("gloo", rank=0, world_size=1)

    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
    from tests.golden.ref_torch_stub import load_reference_model

    if args.small_text:
        # the study's --small_text trunk (shared literal: lang/roberta)
        from butd_detr_tpu.lang import small_text_roberta_config

        sc = small_text_roberta_config()
        rconf = dict(
            vocab_size=sc.vocab_size, hidden_size=sc.hidden_size,
            num_hidden_layers=sc.num_hidden_layers,
            num_attention_heads=sc.num_attention_heads,
            intermediate_size=sc.intermediate_size,
            max_position_embeddings=sc.max_position_embeddings,
        )
    else:
        # full roberta-base shape, random init — the r1b-r4a text tower
        rconf = dict(
            vocab_size=1024, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514,
        )
    model, _tok, ns = load_reference_model(
        roberta_config=rconf,
        workdir=args.out, seed=args.seed,
        num_class=256, num_obj_class=485, input_feature_dim=3,
        num_queries=256, num_decoder_layers=6,
        self_position_embedding="loc_learned",
        contrastive_align_loss=True, butd=True, self_attend=True,
    )
    tok = SimpleTokenizer(max_len=32)
    model.tokenizer = SimpleTokWrapper(tok)
    for p in model.text_encoder.parameters():  # study: trainable text
        p.requires_grad_(True)

    import importlib

    ref_losses = importlib.import_module("refmodels.losses")
    matcher = ref_losses.HungarianMatcher(1, 0, 2, True)
    set_criterion = ref_losses.SetCriterion(
        matcher=matcher, losses=["boxes", "labels", "contrastive_align"],
        eos_coef=0.1, temperature=0.07,
    )
    criterion = ref_losses.compute_hungarian_loss

    # 3-group AdamW, cls-recipe rates (main_utils.py:255-284,
    # scripts/train_test_cls.sh)
    backbone, text, rest = [], [], []
    for n, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (backbone if "backbone_net" in n else
         text if "text_encoder" in n else rest).append(p)
    opt = torch.optim.AdamW(
        [{"params": rest, "lr": args.lr},
         {"params": backbone, "lr": args.lr_backbone},
         {"params": text, "lr": args.lr_text}],
        lr=args.lr, weight_decay=5e-4,
    )

    from butd_detr_tpu.data.loader import collate

    probe_ds = build_dataset(args.data, tok, "val", joint_det=False,
                             num_points=args.num_points, eval_train=True)
    probe_path = osp.join(args.out, "probe.jsonl")
    if args.overfit:
        # single fixed unaugmented batch — train and probe on the same
        # samples; both arms (this and scripts/overfit_probe.py) draw the
        # identical batch through the identical host pipeline
        probe_batch = collate([probe_ds[i] for i in range(args.overfit)])
        train_ds = None
        n = args.overfit
    else:
        train_ds = build_dataset(args.data, tok, "train",
                                 num_points=args.num_points)
        probe_batch = collate([probe_ds[i] for i in range(8)])
        n = len(train_ds)
    rng = np.random.RandomState(args.seed)
    order = rng.permutation(n)
    pos = 0
    model.train()
    t0 = time.time()
    for step in range(args.steps):
        if args.overfit:
            batch_np = probe_batch
        else:
            if pos + args.batch > n:
                order, pos = rng.permutation(n), 0
            idx = order[pos:pos + args.batch]
            pos += args.batch
            batch_np = collate([train_ds[int(i)] for i in idx])
        tb = {k: torch.as_tensor(v) for k, v in batch_np.items()
              if hasattr(v, "dtype")}
        inputs = {
            "point_clouds": tb["point_clouds"].float(),
            "text": list(batch_np["utterances"]),
            "det_boxes": tb["all_detected_boxes"].float(),
            "det_bbox_label_mask": tb["all_detected_bbox_label_mask"].bool(),
            "det_class_ids": tb["all_detected_class_ids"].long(),
        }
        end_points = model(inputs)
        for k, v in tb.items():
            if k not in end_points:
                end_points[k] = v
        loss, end_points = criterion(
            end_points, 6, set_criterion, query_points_obj_topk=4
        )
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            [p for g in opt.param_groups for p in g["params"]], 0.1
        )
        opt.step()
        if step % 10 == 0:
            print(f"step {step} loss {float(loss):.2f} "
                  f"ce {float(end_points['loss_ce']):.3f} "
                  f"giou {float(end_points['loss_giou']):.3f} "
                  f"({(time.time()-t0)/max(step,1):.1f}s/step)", flush=True)
        if step % args.probe_freq == 0 or step == args.steps - 1:
            probe(model, probe_batch, step, probe_path)
            torch.save({"model": model.state_dict(), "step": step},
                       osp.join(args.out, "ckpt_last.pth"))


if __name__ == "__main__":
    main()
