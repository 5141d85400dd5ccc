"""Host input-pipeline sustainment benchmark (VERDICT r3 #5).

Measures how many scenes/sec the HOST side alone — augmentation (50k-pt
numpy), tokenization, positive maps, collation to fixed shapes, worker
transport — can feed, with no device in the loop. The scanned-bench
number (bench.py) assumes the input pipeline keeps up; this measures
whether it does, and where it caps on a given host.

Reference equivalent: the torch DataLoader worker pool
(main_utils.py:197-233) paying the same per-sample cost
(joint_det_dataset.py:626-790).

Usage:
  python scripts/bench_input_pipeline.py [--workers N] [--batch 24]
                                         [--points 50000] [--batches 20]
Prints one JSON line: {"scenes_per_sec": ..., "workers": ..., ...}.
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
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--points", type=int, default=50000)
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--batches", type=int, default=20,
                    help="timed batches (after a 3-batch warmup)")
    ap.add_argument("--out", default="/tmp/bench_input_pipeline")
    args = ap.parse_args()

    from butd_detr_tpu.data import DataLoader, JointGroundingDataset
    from butd_detr_tpu.data.scan import load_scans_parallel
    from butd_detr_tpu.data.synthetic import make_rich_scannet
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer

    root = osp.join(args.out, "data")
    if not osp.exists(osp.join(root, "refer_it_3d", "sr3d.csv")):
        make_rich_scannet(
            root, n_train=args.scenes, n_val=2,
            objects_per_scan=5, points_per_scan=args.points,
        )
    with open(osp.join(root, "meta_data", "scannetv2_train.txt")) as f:
        ids = [l.strip() for l in f if l.strip()]
    scans = load_scans_parallel(
        ids, osp.join(root, "scans"), osp.join(root, "meta_data"),
        num_workers=args.workers or 1, keep_points=args.points,
    )
    ds = JointGroundingDataset(
        dataset_dict={"sr3d": 1}, split="train", test_dataset="sr3d",
        data_path=root, scans=scans,
        tokenizer=SimpleTokenizer(max_len=32),
        use_color=True, butd=True, max_text_len=32,
        max_num_obj=16, max_det_boxes=16,
    )
    loader = DataLoader(
        ds, batch_size=args.batch, shuffle=True, seed=0,
        num_workers=args.workers,
    )

    # warmup (pool spin-up + first prefetch), then timed steady state,
    # wrapping over epochs as a real run would
    need = args.batches + 3
    done = 0
    t0 = None
    epoch = 0
    while done < need:
        loader.set_epoch(epoch)
        for batch in loader:
            done += 1
            if done == 3:
                t0 = time.time()
            if done >= need:
                break
        epoch += 1
    dt = time.time() - t0
    per_sec = args.batch * args.batches / dt
    print(json.dumps({
        "metric": "host_input_pipeline_scenes_per_sec",
        "scenes_per_sec": round(per_sec, 2),
        "ms_per_batch": round(1000 * dt / args.batches, 1),
        "workers": args.workers,
        "batch": args.batch,
        "points": args.points,
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
