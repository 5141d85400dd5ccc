#!/usr/bin/env python
"""Download only the ScanNet files this framework needs.

Equivalent of reference scripts/download_scannet_files.py: drives the
official `download-scannet.py` (which you must obtain from the ScanNet
authors after signing their terms of use) once per scan id and file type.

Usage:
    python scripts/download_scannet_files.py --meta_dir data/meta_data \
        --downloader ./download-scannet.py --out .
"""

import argparse
import os
import subprocess

FILE_TYPES = (
    ".aggregation.json",
    ".txt",
    "_vh_clean_2.0.010000.segs.json",
    "_vh_clean_2.ply",
    "_vh_clean_2.labels.ply",
)


def get_scan_ids(meta_dir: str):
    scan_ids = set()
    for split in ("train", "val"):
        with open(os.path.join(meta_dir, f"scannetv2_{split}.txt")) as f:
            scan_ids.update(line.strip() for line in f if line.strip())
    return sorted(scan_ids)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta_dir", default="data/meta_data")
    parser.add_argument("--downloader", default="download-scannet.py")
    parser.add_argument("--out", default=".")
    args = parser.parse_args()

    scan_ids = get_scan_ids(args.meta_dir)
    for i, scan_id in enumerate(scan_ids):
        print(f"[{i + 1}/{len(scan_ids)}] {scan_id}")
        for filetype in FILE_TYPES:
            subprocess.run(
                ["python", args.downloader, "-o", args.out,
                 "--id", scan_id, "--type", filetype],
                check=False,
            )


if __name__ == "__main__":
    main()
