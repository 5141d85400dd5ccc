"""Grounding-chain diagnostic: where does accuracy break? (round 4)

Loads an accuracy-study checkpoint (scripts/accuracy_study.py output),
runs one unaugmented TRAIN-split batch forward in eval mode, and reports
per prefix:
  - matched-query CE vs the unmatched(no-object) CE — detects soft-token
    eos collapse (matched argmax landing on bin 255);
  - the Hungarian assignment of the root target (matched query q*);
  - q*'s span probability mass + argmax bin vs the GT span bins;
  - q*'s predicted-box IoU vs the target box (the GT evaluator gates on
    max-IoU>0.25 with ANY scene box — bad boxes pin accuracy at chance);
  - the bbs score rank of q* among all queries;
  - the GT-evaluator's chosen query and whether its snap hits the target.

Usage:
  python scripts/diag_grounding.py [/tmp/study_cls2] [--batch 8]

This is how the round-4 eos-collapse finding was made (NOTES.md): after
800 steps of the sr3d-only cls study, unmatched CE was ~0.000 while
matched CE was 6.5-8.2 with argmax bin 255 on EVERY matched query — the
1-positive-in-256-queries signal loses to the eos anchor, which is why
both reference recipes train joint_det (scannet prompts carry ~K
positives per sample).
"""
import argparse
import json
import os
import os.path as osp
import sys

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("study", nargs="?", default="/tmp/study_cls2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="run on CPU so a chip-resident study is undisturbed")
    ap.add_argument("--small_text", action="store_true",
                    help="study was run with accuracy_study --small_text")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from butd_detr_tpu.data import JointGroundingDataset
    from butd_detr_tpu.data.loader import collate
    from butd_detr_tpu.data.scan import load_scans_parallel
    from butd_detr_tpu.lang import roberta_base_config, tiny_roberta_config
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
    from butd_detr_tpu.losses.matcher import hungarian_match
    from butd_detr_tpu.losses.boxes import (
        box_cxcyczwhd_to_xyzxyz,
        pairwise_iou3d,
    )
    from butd_detr_tpu.train import Config, init_state, make_optimizer
    from butd_detr_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )
    from butd_detr_tpu.train.step import (
        INPUT_KEYS,
        build_model,
        criterion_config,
    )
    from scripts.train_split_eval import make_trainval_root

    root = osp.join(args.study, "data")
    with open(osp.join(args.study, "log", "config.json")) as f:
        raw = json.load(f)
    cfg = Config(**{
        k: v for k, v in raw.items() if k in Config.__dataclass_fields__
    })

    tok = SimpleTokenizer(max_len=cfg.max_text_len)
    with open(osp.join(root, "meta_data", "scannetv2_train.txt")) as f:
        train_ids = [l.strip() for l in f if l.strip()]
    scans = load_scans_parallel(
        train_ids, osp.join(root, "scans"), osp.join(root, "meta_data"),
        num_workers=1, keep_points=cfg.num_points,
    )
    ds = JointGroundingDataset(
        split="val", dataset_dict={"sr3d": 1}, test_dataset="sr3d",
        data_path=make_trainval_root(root), scans=scans, tokenizer=tok,
        use_color=cfg.use_color, butd=cfg.butd, butd_cls=cfg.butd_cls,
        butd_gt=cfg.butd_gt, max_text_len=cfg.max_text_len,
        max_num_obj=cfg.max_num_obj, max_det_boxes=cfg.max_det_boxes,
    )
    B = args.batch
    batch = collate([ds[i] for i in range(B)])

    tiny = cfg.num_points < 5000
    if tiny:
        model = build_model(cfg, roberta_config=tiny_roberta_config(),
                            backbone_npoints=(256, 128, 64, 32))
    elif args.small_text:
        # the r4b --small_text study arm (scripts/accuracy_study.py)
        from butd_detr_tpu.lang import small_text_roberta_config

        model = build_model(cfg, roberta_config=small_text_roberta_config())
    else:
        model = build_model(cfg, roberta_config=roberta_base_config())
    optimizer = make_optimizer(cfg, steps_per_epoch=100)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    ck = latest_checkpoint(osp.join(args.study, "log"))
    state, ep = load_checkpoint(ck, state)
    print(f"# restored {ck} (epoch {ep - 1})")

    inputs = {k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch}
    end_points = jax.jit(
        lambda p, bs, i: model.apply(
            {"params": p, "batch_stats": bs}, i, train=False
        )
    )(state.params, state.batch_stats, inputs)
    end_points = {k: np.asarray(v) for k, v in end_points.items()}

    pmap = batch["positive_map"]  # (B, G, 256)
    gt_boxes = np.concatenate(
        [batch["center_label"][..., :3], batch["size_gts"]], axis=-1
    )
    mask = batch["box_label_mask"]
    all_boxes = batch["all_bboxes"]
    all_mask = batch["all_bbox_label_mask"].astype(bool)
    crit = criterion_config(cfg)

    for prefix in ("proposal_", "last_"):
        logits = end_points[f"{prefix}sem_cls_scores"]  # (B, Q, 256)
        pred = np.concatenate(
            [end_points[f"{prefix}center"],
             end_points[f"{prefix}pred_size"]], axis=-1,
        )
        assignment = np.asarray(hungarian_match(
            jnp.asarray(logits), jnp.asarray(pred), jnp.asarray(pmap),
            jnp.asarray(gt_boxes), jnp.asarray(mask),
            crit.cost_class, crit.cost_bbox, crit.cost_giou,
        ))  # (B, G)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))

        iou_all, _ = pairwise_iou3d(
            jnp.asarray(box_cxcyczwhd_to_xyzxyz(jnp.asarray(all_boxes))),
            jnp.asarray(box_cxcyczwhd_to_xyzxyz(jnp.asarray(pred))),
        )
        iou_all = np.where(all_mask[:, :, None], np.asarray(iou_all), 0.0)
        is_correct = iou_all.max(axis=1) > 0.25  # (B, Q)

        ce_m = [-np.log(max(float(probs[b, int(assignment[b, 0])][
            np.nonzero(pmap[b, 0])[0]].sum()), 1e-9)) for b in range(B)]
        ce_eos = [-float(logp[b, :, -1].mean()) for b in range(B)]
        print(f"== {prefix} matched-CE {np.mean(ce_m):.3f}  "
              f"unmatched(eos)-CE {np.mean(ce_eos):.3f}")

        for b in range(B):
            q = int(assignment[b, 0])
            span = np.nonzero(pmap[b, 0])[0]
            sc = probs[b] @ pmap[b, 0]  # (Q,) bbs root scores
            iou_t, _ = pairwise_iou3d(
                jnp.asarray(box_cxcyczwhd_to_xyzxyz(
                    jnp.asarray(gt_boxes[b:b + 1, :1]))),
                jnp.asarray(box_cxcyczwhd_to_xyzxyz(
                    jnp.asarray(pred[b:b + 1, q:q + 1]))),
            )
            sc_eval = sc * is_correct[b]
            top = int(sc_eval.argmax())
            snap = int(np.where(
                all_mask[b], iou_all[b, :, top], -1.0
            ).argmax())
            print("  ", dict(
                q=q, p_span=round(float(probs[b, q, span].sum()), 3),
                argmax_bin=int(probs[b, q].argmax()), span=span.tolist(),
                rank_of_q=int((sc > sc[q]).sum()),
                iou_vs_target=round(float(np.asarray(iou_t).ravel()[0]), 3),
                q_is_correct=bool(is_correct[b, q]),
                n_correct=int(is_correct[b].sum()),
                top_query=top, top_is_q=top == q,
                hit=bool((all_boxes[b, snap] == gt_boxes[b, 0]).all()),
            ))


if __name__ == "__main__":
    main()
