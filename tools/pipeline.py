"""Segmentation pipeline CLI:
python tools/pipeline.py --config configs/pipeline/pipeline.yaml

Parity: reference tools/pipeline/pipeline.py entry point.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from treelearn_tpu.config import get_config
from treelearn_tpu.pipeline import run_treelearn_pipeline

if __name__ == "__main__":
    parser = argparse.ArgumentParser("treelearn_tpu pipeline")
    parser.add_argument("--config", type=str, help="path to pipeline config")
    args = parser.parse_args()
    config = get_config(args.config)
    result = run_treelearn_pipeline(config, args.config)
    print(result)
