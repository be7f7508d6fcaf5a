"""Validation-tile generation CLI:
python tools/gen_val_data.py --config configs/data_gen/gen_val_data.yaml

Parity: reference tools/data_gen/gen_val_data.py — tile generation with
stride 1 (no overlap).
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

if __name__ == "__main__":
    from treelearn_tpu.config import get_config
    from treelearn_tpu.logging_utils import get_root_logger
    from treelearn_tpu.pipeline import generate_tiles

    parser = argparse.ArgumentParser("tile_generation")
    parser.add_argument("--config", type=str)
    args = parser.parse_args()
    cfg = get_config(args.config)
    base_dir = os.path.dirname(os.path.dirname(cfg.forest_path))
    logger = get_root_logger(osp.join(base_dir, "log_tile_generation"))
    generate_tiles(cfg.sample_generation, cfg.forest_path, logger)
