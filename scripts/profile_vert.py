"""Time verticality_banded parts on the bench pointwise data (steady state)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from treelearn_tpu.pipeline.instances import softmax_np

z = np.load("/root/repo/bench_workdir/plot/results/pointwise_results/pointwise_results.npz")
coords = z["coords"].astype(np.float32)
offs = z["offset_predictions"]
logits = z["semantic_prediction_logits"]
probs = softmax_np(np.asarray(logits, np.float64))
pre = np.where((probs[:, 0] >= 0.5) & (np.abs(offs[:, 2]) < 4.0))[0]
print(f"refs {len(coords)}  queries {len(pre)}")

points = coords[:, :3]
queries = points[pre]

from treelearn_tpu.ops.pallas_vert import verticality_banded

for rep in range(3):
    t0 = time.time()
    v, cnt, over = verticality_banded(points + np.float32(1e-4 * rep),
                                      queries + np.float32(1e-4 * rep), 0.6)
    t1 = time.time()
    print(f"rep{rep}: banded {t1-t0:.2f}s  overflow {over.sum()} / {len(over)}")

# host-prep-only timing: replicate the numpy part
t0 = time.time()
cell = 0.6
width = 30000
ij_r = np.floor(points[:, :2] / cell).astype(np.int64)
ij_q = np.floor(queries[:, :2] / cell).astype(np.int64)
mins = np.minimum(ij_r.min(axis=0), ij_q.min(axis=0))
keys_r = (ij_r[:, 0] - mins[0]) * width + (ij_r[:, 1] - mins[1])
keys_q = (ij_q[:, 0] - mins[0]) * width + (ij_q[:, 1] - mins[1])
order_r = np.argsort(keys_r, kind="stable")
order_q = np.argsort(keys_q, kind="stable")
print(f"host sort prep: {time.time()-t0:.2f}s")

# full compute_verticality (the instances.py call)
from treelearn_tpu.ops.features import compute_verticality
t0 = time.time()
vert = compute_verticality(points, search_radius=0.6, query_idx=pre)
print(f"compute_verticality total: {time.time()-t0:.2f}s")
t0 = time.time()
vert = compute_verticality(points, search_radius=0.6, query_idx=pre)
print(f"compute_verticality again: {time.time()-t0:.2f}s")
