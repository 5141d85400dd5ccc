"""Post-hoc TRAIN-split grounding accuracy per checkpoint (study follow-up).

The accuracy study (scripts/accuracy_study.py) logs VAL-split accuracy
each val_freq epochs; this script replays its saved checkpoints against
the TRAIN scenes (unaugmented, split='val' pipeline semantics) — the
apples-to-apples analogue of the r1b 4-scene overfit metric, i.e. "does
the pipeline learn the mapping at 96-scene scale".

Usage:
  python scripts/train_split_eval.py --study /tmp/accuracy_study
"""
import argparse
import json
import os
import os.path as osp
import shutil
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_trainval_root(root: str) -> str:
    """Shadow data root where the 'test' split lists the TRAIN scans."""
    alt = root.rstrip("/") + "_trainval"
    if osp.exists(osp.join(alt, "meta_data", "sr3d_test_scans.txt")):
        return alt
    os.makedirs(alt, exist_ok=True)
    for name in os.listdir(root):
        src = osp.join(root, name)
        dst = osp.join(alt, name)
        if name == "meta_data":
            shutil.copytree(src, dst, dirs_exist_ok=True)
        elif not osp.exists(dst):
            # absolute target: a RELATIVE src (e.g. "studies/x/data/scans")
            # would resolve against the symlink's own directory and dangle
            # (advisor find, round 4)
            os.symlink(osp.abspath(src), dst)
    meta = osp.join(alt, "meta_data")
    shutil.copy(osp.join(meta, "sr3d_train_scans.txt"),
                osp.join(meta, "sr3d_test_scans.txt"))
    # the study harness reads scannetv2_val.txt for the scan preload list
    shutil.copy(osp.join(meta, "scannetv2_train.txt"),
                osp.join(meta, "scannetv2_val.txt"))
    # drop stale split caches if any
    for f in ("val_v3scans.pkl",):
        p = osp.join(alt, f)
        if osp.exists(p) and not osp.islink(p):
            os.remove(p)
    return alt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", default="/tmp/accuracy_study")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--scan_points", type=int, default=20000)
    args = ap.parse_args()

    import jax

    cache = osp.join(tempfile.gettempdir(), "butd_detr_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from butd_detr_tpu.data import JointGroundingDataset
    from butd_detr_tpu.data.loader import DataLoader
    from butd_detr_tpu.data.scan import load_scans_parallel
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
    from butd_detr_tpu.parallel import commit_replicated, make_mesh
    from butd_detr_tpu.train import (
        Config,
        TrainTester,
        init_state,
        make_eval_step,
        make_optimizer,
        shard_eval_step,
    )
    from butd_detr_tpu.train.checkpoint import load_checkpoint

    root = make_trainval_root(osp.join(args.study, "data"))
    log_dir = osp.join(args.study, "log")
    epochs = sorted(
        int(d.split("_")[-1]) for d in os.listdir(log_dir)
        if d.startswith("ckpt_epoch_")
    )
    print(f"checkpoints: {epochs}", flush=True)

    cfg = Config(
        dataset=["sr3d"], test_dataset="sr3d", data_root=root,
        use_color=True, butd=True, self_attend=True,
        use_soft_token_loss=True, use_contrastive_align=True,
        batch_size=args.batch, num_points=50000,
        max_num_obj=16, max_det_boxes=16, max_text_len=32,
        num_workers=2, dp=1, log_dir=osp.join(args.study, "log_traineval"),
    )

    with open(osp.join(root, "meta_data", "scannetv2_train.txt")) as f:
        train_ids = [l.strip() for l in f if l.strip()]
    scans = load_scans_parallel(
        train_ids, osp.join(root, "scans"), osp.join(root, "meta_data"),
        num_workers=2, keep_points=50000,
    )
    tok = SimpleTokenizer(max_len=cfg.max_text_len)
    test_ds = JointGroundingDataset(
        split="val", dataset_dict={"sr3d": 1}, test_dataset="sr3d",
        data_path=root, scans=scans, tokenizer=tok, use_color=True,
        butd=True, max_text_len=cfg.max_text_len,
        max_num_obj=cfg.max_num_obj, max_det_boxes=cfg.max_det_boxes,
    )
    print(f"train-split eval annotations: {len(test_ds)}", flush=True)

    tt = TrainTester(cfg)
    loader = DataLoader(
        test_ds, batch_size=cfg.batch_size, shuffle=False,
        num_workers=cfg.num_workers, drop_last=False,
    )
    mesh = make_mesh(dp=1)
    model = tt.get_model()
    optimizer = make_optimizer(cfg, steps_per_epoch=20)
    rng = jax.random.PRNGKey(0)
    sample = next(iter(loader))
    state = commit_replicated(
        mesh, init_state(model, optimizer, sample, rng))
    eval_step = shard_eval_step(
        make_eval_step(model, cfg, with_loss=True), mesh)

    rows = []
    for ep in epochs:
        t0 = time.time()
        state, _ = load_checkpoint(
            osp.join(log_dir, f"ckpt_epoch_{ep}"), state)
        state = commit_replicated(mesh, state)
        ev = tt.evaluate_one_epoch(ep, loader, eval_step, state, mesh)
        row = {"epoch": ep}
        for t in (0.25, 0.5):
            for k in (1, 5):
                for mode in ("bbs", "bbf"):
                    try:
                        row[f"acc@{t}_top{k}_{mode}"] = round(
                            ev.accuracy("last_", t, k, mode), 4)
                    except Exception:
                        pass
        rows.append(row)
        print(f"TRAINEVAL {json.dumps(row)} ({time.time()-t0:.0f}s)",
              flush=True)
        with open(osp.join(args.study, "train_split_eval.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
