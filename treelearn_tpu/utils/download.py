"""Dataset and model-weight download helper.

Parity: reference tree_learn/util/download.py — file-ID tables for the
Göttingen Research Online archive (doi:10.25625/VPMPID): the L1W benchmark,
18 automatically segmented training plots, evaluation cloud, and published
model weights.  Requires network access; in air-gapped environments this
module only reports the URLs.
"""

from __future__ import annotations

import os
import urllib.request

BASE_PATH = ("https://data.goettingen-research-online.de/api/access/datafile/"
             ":persistentId?persistentId=doi:10.25625/VPMPID/")

# dataset name -> [(file_id, filename), ...] (reference download.py:8-76)
DATASETS = {
    "automatically_segmented": [
        ("VZ2ENJ", "A1N.laz"), ("4BA1BD", "A1W.laz"), ("MOFUYC", "G1N.laz"),
        ("I0M17S", "G1W.laz"), ("GQAIGP", "G2N.laz"), ("XHACRG", "G2W.laz"),
        ("K8UOPU", "G3N.laz"), ("KT8EB4", "G3W.laz"), ("0FIQFD", "G4N.laz"),
        ("XXWS3Z", "G4W.laz"), ("8ZOLYB", "L1N.laz"), ("2OU297", "L2N.laz"),
        ("YGJKLJ", "L2W.laz"), ("3WBA7S", "LG1.laz"), ("OBJTIG", "LG2.laz"),
        ("EDG9IB", "LG3.laz"), ("UXBEDS", "O1N.laz"), ("1IE8CP", "O1W.laz"),
    ],
    "benchmark_dataset": [("ZITXOQ", "L1W.laz")],
    "benchmark_dataset_voxelized": [("1K7MCR", "L1W_voxelized01.laz")],
    "benchmark_dataset_evaluation": [("GOKV7W", "L1W_voxelized01_for_eval.laz")],
    # published model weights (reference download.py:50-82); .pth files load
    # through model/checkpoint.py's torch-layout importer
    "model_weights_diverse_training_data": [
        ("1JMEQV", "model_weights_diverse_training_data.pth")],
    "model_weights_20241213": [("IMHF3G", "model_weights_20241213.pth")],
    "model_weights_with_small_20241213": [
        ("TYZJ4E", "model_weights_with_small_20241213.pth")],
    "evaluated_trees": [("WTIB7F", "evaluated_trees.txt")],
}


def dataset_urls(name: str):
    return [(BASE_PATH + fid, fname) for fid, fname in DATASETS[name]]


def download_data(name: str, root: str, logger=None):
    """Download every file of a named dataset into ``root``."""
    os.makedirs(root, exist_ok=True)
    for url, fname in dataset_urls(name):
        dst = os.path.join(root, fname)
        if os.path.exists(dst):
            continue
        if logger:
            logger.info(f"downloading {fname} ...")
        try:
            urllib.request.urlretrieve(url, dst)
        except OSError as e:
            if os.path.exists(dst):
                os.remove(dst)  # never leave a truncated file behind
            raise RuntimeError(
                f"could not download {fname} (no network access?). Fetch it "
                f"manually from {url} and place it at {dst}.") from e
    return root


def main(argv=None):
    """CLI parity with the reference downloader (download.py:121-134):
    ``python -m treelearn_tpu.utils.download --dataset_name X --root_folder Y``."""
    import argparse

    parser = argparse.ArgumentParser("treelearn_tpu downloader")
    parser.add_argument("--dataset_name", required=True,
                        choices=sorted(DATASETS))
    parser.add_argument("--root_folder", required=True)
    args = parser.parse_args(argv)
    download_data(args.dataset_name, args.root_folder)


if __name__ == "__main__":
    main()
