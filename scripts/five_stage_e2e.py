"""Drive the complete 5-stage reference toolchain on synthetic plots:

  1. tools/gen_train_data.py  — random 35 m crops from training plots
  2. tools/gen_val_data.py    — validation tiles
  3. tools/train.py           — a few epochs on the crops
  4. tools/pipeline.py        — segment a held-out plot with the checkpoint
  5. tools/evaluate.py        — score predictions against ground truth

Everything runs through the real CLIs with small user configs that include
the shipped task configs via ``default_args`` (the reference's composition
mechanism).  Workspace under /tmp/five_stage; one PASS/FAIL line per stage.
"""

import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("FIVE_STAGE_DIR", "/tmp/five_stage")


def write_cfg(name, base, **overrides):
    cfg = {"default_args": [os.path.join(REPO, base)]}
    cfg.update(overrides)
    path = f"{WORK}/cfg_{name}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def sh(label, cmd):
    t0 = time.time()
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=1500)
    dt = time.time() - t0
    ok = p.returncode == 0
    print(f"[{'PASS' if ok else 'FAIL'} {dt:6.1f}s] {label}", flush=True)
    if not ok:
        print(p.stdout[-1500:])
        print(p.stderr[-3000:])
        sys.exit(1)
    return p


def main():
    import numpy as np

    sys.path.insert(0, REPO)
    from treelearn_tpu.data.synthetic import make_synthetic_forest

    os.makedirs(f"{WORK}/train/forests", exist_ok=True)
    os.makedirs(f"{WORK}/val/forests", exist_ok=True)
    os.makedirs(f"{WORK}/plot/forest", exist_ok=True)

    for i, seed in enumerate((11, 12)):
        data, _ = make_synthetic_forest(n_trees=14, extent=45.0,
                                        points_per_tree=3000,
                                        ground_points=80000, seed=seed)
        np.savez(f"{WORK}/train/forests/plot{i}.npz",
                 points=data[:, :3].astype(np.float32), labels=data[:, 3])
    data, _ = make_synthetic_forest(n_trees=10, extent=40.0,
                                    points_per_tree=3000,
                                    ground_points=60000, seed=21)
    np.savez(f"{WORK}/val/forests/valplot.npz",
             points=data[:, :3].astype(np.float32), labels=data[:, 3])
    data, _ = make_synthetic_forest(n_trees=12, extent=42.0,
                                    points_per_tree=3000,
                                    ground_points=70000, seed=31)
    np.savez(f"{WORK}/plot/forest/heldout.npz",
             points=data[:, :3].astype(np.float32), labels=data[:, 3])
    print("synthetic plots written", flush=True)

    py = sys.executable

    c1 = write_cfg("gen_train", "configs/data_gen/gen_train_data.yaml",
                   base_dir=f"{WORK}/train", n_samples_total=60)
    sh("gen_train_data", [py, "tools/gen_train_data.py", "--config", c1])

    c2 = write_cfg("gen_val", "configs/data_gen/gen_val_data.yaml",
                   forest_path=f"{WORK}/val/forests/valplot.npz")
    sh("gen_val_data", [py, "tools/gen_val_data.py", "--config", c2])

    c3 = write_cfg(
        "train", "configs/training/train.yaml",
        dataset_train={"data_root": f"{WORK}/train/random_crops/npz"},
        dataset_test={"data_root": f"{WORK}/val/tiles/npz"},
        epochs=2, examples_per_epoch=8,
        dataloader={"train": {"batch_size": 1, "num_workers": 0},
                    "test": {"batch_size": 1, "num_workers": 0}},
        voxel_capacity=1 << 17, validation_frequency=2, save_frequency=1,
        fp16=True)
    sh("train", [py, "tools/train.py", "--config", c3,
                 "--work_dir", f"{WORK}/work"])
    ckpt = sorted(c for c in os.listdir(f"{WORK}/work")
                  if c.endswith(".npz"))[-1]
    print("checkpoint:", ckpt, flush=True)

    c4 = write_cfg(
        "pipeline", "configs/pipeline/pipeline.yaml",
        forest_path=f"{WORK}/plot/forest/heldout.npz",
        pretrain=f"{WORK}/work/{ckpt}",
        voxel_capacity=1 << 18, fp16=True,
        shape_cfg={"outer_remove": None},
        save_cfg={"save_treewise": True})
    sh("pipeline", [py, "tools/pipeline.py", "--config", c4])
    results = f"{WORK}/plot/results"
    assert os.path.isfile(f"{results}/full_forest/heldout.laz"), "missing laz"

    c5 = write_cfg(
        "evaluate", "configs/evaluation/evaluate.yaml",
        paths={"pred_forest_path": f"{results}/full_forest/heldout.laz",
               "gt_forest_path": f"{WORK}/plot/forest/heldout.npz"})
    sh("evaluate", [py, "tools/evaluate.py", "--config", c5,
                    "--work_dir", f"{WORK}/eval"])

    # the evaluation notebook must execute headless on the artifacts the
    # toolchain just produced (VERDICT r2 item 10)
    env = dict(os.environ, FIVE_STAGE_DIR=WORK, MPLBACKEND="Agg")
    t0 = time.time()
    p = subprocess.run(
        [py, "-m", "jupyter", "nbconvert", "--to", "notebook", "--execute",
         "--output", f"{WORK}/TreeLearn_Evaluation_TPU_executed.ipynb",
         os.path.join(REPO, "notebooks", "TreeLearn_Evaluation_TPU.ipynb")],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env)
    ok = p.returncode == 0
    print(f"[{'PASS' if ok else 'FAIL'} {time.time()-t0:6.1f}s] eval notebook",
          flush=True)
    if not ok:
        print(p.stdout[-1500:])
        print(p.stderr[-3000:])
        sys.exit(1)
    print("FIVE-STAGE E2E: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
