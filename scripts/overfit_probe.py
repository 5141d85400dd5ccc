"""JAX-arm single-batch overfit probe (VERDICT r4 weak #8 / next #1).

Trains THIS framework's production step (train/step.make_train_step — the
same jitted forward/Hungarian/loss/AdamW program the studies run) on ONE
fixed unaugmented batch and probes it with the SAME metric code the
reference-torch arm uses (scripts/probe_common.probe_row), on the SAME
samples drawn through the SAME host pipeline. The discriminating
question across the two arms: does the matched soft-token argmax escape
the no-object bin (255) under pure memorization?

Pair with:
  python scripts/ref_control_arm.py --data <root> --overfit 24 \
      --small_text --num_points N --steps S --out studies/attrib_r5/ref
  python scripts/overfit_probe.py --data <root> --overfit 24 \
      --small_text --num_points N --steps S --out studies/attrib_r5/jax

Reference recipe being mirrored: scripts/train_test_cls.sh +
main_utils.py:255-284 (3-group AdamW: lr 1e-4 / backbone 1e-3 / text
1e-4, wd 5e-4, clip 0.1), constant LR (milestones out of reach).
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/repo/studies/cls_r4/data")
    ap.add_argument("--out", default="/root/repo/studies/attrib_r5/jax")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--overfit", type=int, default=24)
    ap.add_argument("--num_points", type=int, default=20000)
    ap.add_argument("--probe_freq", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr_backbone", type=float, default=1e-3)
    ap.add_argument("--lr_text", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small_text", action="store_true")
    ap.add_argument("--num_target", type=int, default=256,
                    help="query count (a real reference CLI flag, "
                    "main_utils.py --num_target; default 256). Fewer "
                    "queries cut the eos:positive supervision ratio AND "
                    "stabilize the Hungarian assignment at small scale")
    ap.add_argument("--eos_coef", type=float, default=0.1,
                    help="soft-token no-object weight (reference 0.1). "
                    "Study-arm knob: the attribution probes show the eos "
                    "prior beats the span signal in BOTH systems at this "
                    "data scale")
    ap.add_argument("--text_init", default=None,
                    help="npz from scripts/pretrain_text.py: start from a "
                    "class-discriminative small trunk (the offline proxy "
                    "for the reference's pretrained roberta-base)")
    ap.add_argument("--cpu", action="store_true",
                    help="force host CPU (leave the chip free)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    with open(osp.join(args.out, "invocation.json"), "w") as f:
        json.dump({"argv": sys.argv, "args": vars(args)}, f, indent=1)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import tempfile

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        osp.join(tempfile.gettempdir(), "butd_detr_tpu_jax_cache"),
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from butd_detr_tpu.data.loader import collate
    from butd_detr_tpu.lang import (
        roberta_base_config,
        small_text_roberta_config,
    )
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
    from butd_detr_tpu.train import Config, init_state, make_optimizer
    from butd_detr_tpu.train.step import (
        INPUT_KEYS,
        TARGET_KEYS,
        build_model,
        make_train_step,
    )
    from scripts.probe_common import append_row, build_dataset, probe_row

    cfg = Config(
        dataset=["sr3d"], test_dataset="sr3d", data_root=args.data,
        use_color=True, butd=False, butd_cls=True, self_attend=True,
        use_soft_token_loss=True, use_contrastive_align=True,
        batch_size=args.overfit, num_points=args.num_points,
        max_num_obj=16, max_det_boxes=16, max_text_len=32,
        lr=args.lr, lr_backbone=args.lr_backbone, weight_decay=5e-4,
        freeze_text_encoder=False, text_encoder_lr=args.lr_text,
        lr_decay_epochs=[10 ** 6],  # constant LR for the probe
        num_target=args.num_target,
        eos_coef=args.eos_coef,
        log_dir=args.out,
    )

    tok = SimpleTokenizer(max_len=cfg.max_text_len)
    ds = build_dataset(args.data, tok, "val", joint_det=False,
                       num_points=args.num_points, eval_train=True)
    batch_np = collate([ds[i] for i in range(args.overfit)])
    batch = {
        k: jnp.asarray(batch_np[k])
        for k in set(INPUT_KEYS) | set(TARGET_KEYS)
        if k in batch_np
    }

    model = build_model(
        cfg,
        roberta_config=(small_text_roberta_config() if args.small_text
                        else roberta_base_config()),
    )
    optimizer = make_optimizer(cfg, steps_per_epoch=10 ** 6)
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    state = init_state(model, optimizer, batch, rng)
    print(f"# init {time.time() - t0:.0f}s", flush=True)
    if args.text_init:
        from scripts.probe_common import load_text_init

        state = state.replace(
            params=load_text_init(args.text_init, state.params)
        )
        print(f"# text_encoder initialized from {args.text_init}",
              flush=True)

    train_step = jax.jit(make_train_step(model, cfg, optimizer),
                         donate_argnums=(0,))
    fwd = jax.jit(
        lambda p, bs, i: model.apply(
            {"params": p, "batch_stats": bs}, i, train=False
        )
    )
    inputs = {k: batch[k] for k in INPUT_KEYS if k in batch}
    probe_path = osp.join(args.out, "probe.jsonl")

    def run_probe(step):
        ep = fwd(state.params, state.batch_stats, inputs)
        preds = {
            prefix: (
                np.asarray(ep[f"{prefix}sem_cls_scores"], np.float32),
                np.concatenate(
                    [np.asarray(ep[f"{prefix}center"], np.float32),
                     np.asarray(ep[f"{prefix}pred_size"], np.float32)], -1,
                ),
            )
            for prefix in ("proposal_", "last_")
        }
        append_row(probe_row(preds, batch_np, step), probe_path)

    t0 = time.time()
    for step in range(args.steps):
        if step % args.probe_freq == 0:
            run_probe(step)
        state, metrics = train_step(state, batch, rng)
        if step % 10 == 0:
            m = {k: round(float(v), 3) for k, v in metrics.items()}
            print(f"step {step} {m} "
                  f"({(time.time() - t0) / max(step, 1):.1f}s/step)",
                  flush=True)
    run_probe(args.steps)


if __name__ == "__main__":
    main()
