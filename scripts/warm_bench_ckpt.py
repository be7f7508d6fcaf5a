"""Warm the bench's selftrain checkpoint cache (same recipe as bench.py).

Run ahead of `python bench.py` so the scored passes skip straight to
inference; the checkpoint is keyed by the recipe fingerprint in
`treelearn_tpu/train/selftrain.py`, so this must mirror bench.py exactly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.config import get_config
from treelearn_tpu.train.selftrain import (BENCH_RECIPE,
                                           train_synthetic_checkpoint)

T0 = time.time()


def log(msg):
    print(f"[warm +{time.time() - T0:7.1f}s] {msg}", flush=True)


config = get_config(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "pipeline", "pipeline.yaml"))
# the ONE shared recipe (ADVICE r4): bench.py passes the same dict, so the
# checkpoint-cache fingerprint cannot drift between this script and the bench
recipe = dict(BENCH_RECIPE)
recipe["steps"] = int(os.environ.get("BENCH_TRAIN_STEPS", recipe["steps"]))
recipe["n_crops"] = int(os.environ.get("BENCH_TRAIN_CROPS",
                                       recipe["n_crops"]))
path = train_synthetic_checkpoint(dict(config.model), logger=log, **recipe)
log(f"checkpoint ready: {path}")
