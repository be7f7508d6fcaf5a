"""Training-crop generation CLI:
python tools/gen_train_data.py --config configs/data_gen/gen_train_data.yaml

Parity: reference tools/data_gen/gen_train_data.py — voxelize each forest
plot, compute verticality, build occupancy grids, allocate crops per plot
proportional to occupied area, generate rotated random crops.
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

INSTANCE_LABEL_IGNORE = -1


def generate_random_crops(cfg):
    from treelearn_tpu.io import load_data
    from treelearn_tpu.logging_utils import get_root_logger
    from treelearn_tpu.ops.features import compute_verticality
    from treelearn_tpu.ops.voxelize import voxel_downsample_trace_np
    from treelearn_tpu.pipeline import SampleGenerator

    documentation_dir = osp.join(cfg.base_dir, "documentation")
    os.makedirs(documentation_dir, exist_ok=True)
    logger = get_root_logger(osp.join(documentation_dir, "log_random_crop_generation"))

    forests_dir = osp.join(cfg.base_dir, "forests")
    voxelized_dir = osp.join(cfg.base_dir,
                             f"forests_voxelized{cfg.sample_generation.voxel_size}")
    features_dir = osp.join(cfg.base_dir, "features")
    occupancy_dir = osp.join(cfg.base_dir, "occupancy")
    save_dir = osp.join(cfg.base_dir, "random_crops")
    for d in (voxelized_dir, features_dir, occupancy_dir, save_dir):
        os.makedirs(d, exist_ok=True)

    logger.info("voxelizing forests...")
    for plot_file in sorted(os.listdir(forests_dir)):
        plot_name = plot_file[:-4]
        out = osp.join(voxelized_dir, f"{plot_name}.npz")
        if osp.exists(out):
            continue
        data = load_data(osp.join(forests_dir, plot_file))
        down, first_idx, _ = voxel_downsample_trace_np(
            data[:, :3], cfg.sample_generation.voxel_size)
        labels = data[first_idx, 3]
        np.savez_compressed(out, points=np.round(down, 2).astype(np.float32),
                            labels=labels)

    logger.info("calculating features...")
    for plot_file in sorted(os.listdir(voxelized_dir)):
        plot_name = plot_file[:-4]
        out = osp.join(features_dir, f"{plot_name}.npz")
        if osp.exists(out):
            continue
        data = load_data(osp.join(voxelized_dir, plot_file))
        features = compute_verticality(
            data[:, :3].astype(np.float32),
            search_radius=cfg.sample_generation.search_radius_features)
        np.savez_compressed(out, features=features)

    logger.info("calculating occupancy...")
    n_occupied = {}
    gens = {}
    for plot_file in sorted(os.listdir(voxelized_dir)):
        gen = SampleGenerator(
            plot_path=osp.join(voxelized_dir, plot_file),
            features_path=osp.join(features_dir, plot_file),
            save_dir=save_dir)
        gen.get_occupancy_grid(
            osp.join(occupancy_dir, plot_file), cfg.occupancy_res,
            cfg.n_points_to_calculate_occupancy, cfg.how_far_fill,
            cfg.min_percent_occupied_fill, ignore_for_occupancy=INSTANCE_LABEL_IGNORE)
        n_occupied[plot_file] = float(gen.occupancy_grid[:, :, 2].sum())
        gens[plot_file] = gen

    total = sum(n_occupied.values())
    n_samples = {p: int(np.round(v / total * cfg.n_samples_total))
                 for p, v in n_occupied.items()}
    drift = cfg.n_samples_total - sum(n_samples.values())
    if drift and n_samples:
        n_samples[list(n_samples)[-1]] += drift

    logger.info("getting chunks...")
    for plot_file, gen in gens.items():
        gen.generate_candidates(cfg.n_samples_total, n_samples[plot_file],
                                cfg.chunk_size)
        gen.check_occupancy(cfg.min_percent_occupied_choose)
        n = gen.save()
        logger.info(f"{plot_file}: saved {n} crops")


if __name__ == "__main__":
    from treelearn_tpu.config import get_config

    parser = argparse.ArgumentParser("random_crop_generation")
    parser.add_argument("--config", type=str)
    args = parser.parse_args()
    generate_random_crops(get_config(args.config))
