#!/usr/bin/env python
"""Pre-parse all ScanNet scans into per-split pickle caches.

Replaces the reference's `python prepare_data.py` (prepare_data.py:1-10 ->
save_data, joint_det_dataset.py:1000-1029): loads every scan of each split
with a process pool (native C++ PLY parsing when built) and pickles
{scan_id: Scan} to `{data_root}/{split}_v3scans.pkl`.
"""

import argparse
import os.path as osp
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", default="./")
    parser.add_argument("--splits", nargs="+", default=["train", "val"])
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    from butd_detr_tpu.data.scan import save_scan_cache

    for split in args.splits:
        out = osp.join(args.data_root, f"{split}_v3scans.pkl")
        t0 = time.time()
        save_scan_cache(out, split, args.data_root, args.num_workers)
        print(f"{split}: wrote {out} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
