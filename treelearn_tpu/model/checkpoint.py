"""Checkpointing: native npz checkpoints + torch ``.pth`` import.

Parity targets:
* ``checkpoint_save`` / ``load_checkpoint`` (reference tree_learn/util/train.py:
  46-102): per-epoch save of {net, optimizer, epoch} with pruning of
  non-multiples of save_freq, and loading with size-mismatch key skipping for
  transfer learning.
* The published ``model_weights_*.pth`` checkpoints (reference download.py:55-76)
  must load: we map spconv weight layouts onto our rulebook layout
  (K = k^3 offsets, lexicographic) and split BatchNorm running statistics into
  the state tree.  Note the layout caveat in the reference (util/train.py:70-72):
  some spconv versions permute conv weights; we detect the layout per tensor
  from the expected channel sizes.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Pytree <-> flat dict
# ---------------------------------------------------------------------------

def flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict):
    tree = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


# ---------------------------------------------------------------------------
# Native checkpoints
# ---------------------------------------------------------------------------

def is_multiple(num, multiple):
    return num != 0 and num % multiple == 0


def save_checkpoint(path: str, params, state, opt_state_flat: Optional[dict] = None,
                    epoch: int = 0):
    blobs = {}
    for name, arr in flatten_tree(params).items():
        blobs[f"net/{name}"] = arr
    for name, arr in flatten_tree(state).items():
        blobs[f"state/{name}"] = arr
    if opt_state_flat:
        for name, arr in opt_state_flat.items():
            blobs[f"opt/{name}"] = arr
    blobs["epoch"] = np.asarray(epoch)
    np.savez(path, **blobs)


def load_native_checkpoint(path: str):
    z = np.load(path, allow_pickle=False)
    params_flat, state_flat, opt_flat = {}, {}, {}
    epoch = 0
    for key in z.files:
        if key.startswith("net/"):
            params_flat[key[4:]] = z[key]
        elif key.startswith("state/"):
            state_flat[key[6:]] = z[key]
        elif key.startswith("opt/"):
            opt_flat[key[4:]] = z[key]
        elif key == "epoch":
            epoch = int(z[key])
    return unflatten_tree(params_flat), unflatten_tree(state_flat), opt_flat, epoch


def checkpoint_save(epoch: int, params, state, work_dir: str,
                    opt_state_flat: Optional[dict] = None, save_freq: int = 1):
    """Save epoch checkpoint and prune the previous one unless it is a multiple
    of save_freq (parity: reference util/train.py:46-62)."""
    f = osp.join(work_dir, f"epoch_{epoch}.npz")
    save_checkpoint(f, params, state, opt_state_flat, epoch)
    prev = osp.join(work_dir, f"epoch_{epoch - 1}.npz")
    if osp.isfile(prev) and not is_multiple(epoch - 1, save_freq):
        os.remove(prev)


def opt_state_to_flat(opt_state) -> dict:
    """Flatten an optax optimizer state into an npz-saveable dict keyed by
    leaf index (the tree structure is reproducible from optimizer.init)."""
    import jax

    leaves = jax.tree_util.tree_leaves(opt_state)
    return {f"{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}


def opt_state_from_flat(opt_flat: dict, opt_state_template):
    """Restore an optax state saved by :func:`opt_state_to_flat` into the
    structure of ``opt_state_template`` (a freshly initialized state for the
    same optimizer + params).  Returns the template unchanged when the
    checkpoint holds no optimizer state (pre-upgrade checkpoints)."""
    import jax

    if not opt_flat:
        return opt_state_template
    leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    if len(opt_flat) != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(opt_flat)} leaves, "
            f"optimizer expects {len(leaves)} (different optimizer config?)")
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        arr = np.asarray(opt_flat[f"{i:05d}"])
        tmpl_arr = np.asarray(tmpl)
        if arr.shape != tmpl_arr.shape:
            raise ValueError(f"optimizer leaf {i}: shape {arr.shape} != "
                             f"expected {tmpl_arr.shape}")
        new_leaves.append(arr.astype(tmpl_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

def _convert_conv_weight(w: np.ndarray, k: int) -> np.ndarray:
    """spconv 5-D conv weight -> our (K, c_in, c_out) rulebook layout.

    Handles both layouts seen in spconv checkpoints (reference caveat
    util/train.py:70-72): (c_out, k, k, k, c_in) [spconv2 native] and
    (k, k, k, c_in, c_out) [older]."""
    if w.ndim != 5:
        raise ValueError(f"expected 5-D conv weight, got {w.shape}")
    if w.shape[1] == w.shape[2] == w.shape[3] == k:
        # (c_out, kx, ky, kz, c_in) -> (kx, ky, kz, c_in, c_out)
        w = np.transpose(w, (1, 2, 3, 4, 0))
    elif w.shape[0] == w.shape[1] == w.shape[2] == k:
        pass  # already (kx, ky, kz, c_in, c_out)
    else:
        raise ValueError(f"cannot identify spconv layout for kernel {k}: {w.shape}")
    return np.ascontiguousarray(w.reshape(k ** 3, w.shape[3], w.shape[4]))


def import_torch_state_dict(torch_state: dict, params, state, logger=None,
                            strict: bool = False):
    """Map a reference torch ``state_dict`` onto our (params, state) trees.

    Returns (params, state, skipped_keys).  Keys with mismatched sizes are
    skipped (transfer-learning parity, reference util/train.py:77-84).
    """
    params_flat = flatten_tree(params)
    state_flat = flatten_tree(state)
    skipped, missing_src = [], []

    for key, value in torch_state.items():
        value = np.asarray(value, dtype=np.float32) if np.asarray(value).dtype.kind == "f" \
            else np.asarray(value)
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith(("running_mean", "running_var")):
            if key in state_flat:
                if state_flat[key].shape == value.shape:
                    state_flat[key] = value.astype(np.float32)
                else:
                    skipped.append(key)
            else:
                missing_src.append(key)
            continue

        if key not in params_flat:
            missing_src.append(key)
            continue
        target = params_flat[key]
        if value.ndim == 5:
            # sparse conv weight: infer kernel size from target (K, c_in, c_out)
            k = round(target.shape[0] ** (1.0 / 3.0))
            if k ** 3 != target.shape[0]:
                skipped.append(key)
                continue
            if ".i_branch." in key or (value.shape[1:4] == (1, 1, 1)):
                conv = value.reshape(value.shape[0], value.shape[4])  # (c_out, c_in)
            else:
                try:
                    conv = _convert_conv_weight(value, k)
                except ValueError:
                    skipped.append(key)
                    continue
            if conv.shape == target.shape:
                params_flat[key] = conv.astype(np.float32)
            else:
                skipped.append(key)
        elif value.ndim == 5 or value.shape == target.shape:
            params_flat[key] = value.astype(np.float32)
        elif ".i_branch." in key and value.ndim == 2 and value.shape == target.shape:
            params_flat[key] = value.astype(np.float32)
        else:
            skipped.append(key)

    if logger is not None:
        if skipped:
            logger.info("skipped keys due to size/layout mismatch: " + ", ".join(skipped))
        if missing_src:
            logger.info("source keys not present in model: " + ", ".join(missing_src))
    if strict and (skipped or missing_src):
        raise ValueError(f"strict import failed: skipped={skipped} missing={missing_src}")
    return unflatten_tree(params_flat), unflatten_tree(state_flat), skipped


def _normalize_i_branch(torch_state: dict) -> dict:
    """i_branch Custom1x1Subm3d weights come as (c_out, 1, 1, 1, c_in); collapse
    to the matmul form used everywhere in our tree."""
    out = {}
    for k, v in torch_state.items():
        arr = np.asarray(v)
        if ".i_branch." in k and arr.ndim == 5:
            arr = arr.reshape(arr.shape[0], arr.shape[-1])
        out[k] = arr
    return out


def load_checkpoint(path: str, params, state, logger=None, strict: bool = False):
    """Load a checkpoint file — native ``.npz`` or reference ``.pth``.

    Returns (params, state, epoch + 1) like the reference's resume contract
    (util/train.py:98-102).
    """
    if path.endswith(".npz"):
        p, s, _, epoch = load_native_checkpoint(path)
        # structural merge with size-mismatch skipping
        pf, sf = flatten_tree(params), flatten_tree(state)
        for k, v in flatten_tree(p).items():
            if k in pf and pf[k].shape == v.shape:
                pf[k] = v
        for k, v in flatten_tree(s).items():
            if k in sf and sf[k].shape == v.shape:
                sf[k] = v
        return unflatten_tree(pf), unflatten_tree(sf), epoch + 1

    import torch  # host-only dependency, used purely as a .pth decoder

    blob = torch.load(path, map_location="cpu", weights_only=False)
    torch_state = blob.get("net", blob) if isinstance(blob, dict) else blob
    torch_state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                   for k, v in torch_state.items()}
    torch_state = _normalize_i_branch(torch_state)
    epoch = blob.get("epoch", 0) if isinstance(blob, dict) else 0
    params, state, _ = import_torch_state_dict(torch_state, params, state,
                                               logger=logger, strict=strict)
    return params, state, epoch + 1


def export_torch_state_dict(params, state) -> dict:
    """Our trees -> a reference-layout state_dict (numpy arrays), the inverse of
    :func:`import_torch_state_dict`; useful for cross-validation and for users
    migrating back."""
    out = {}
    for key, w in flatten_tree(params).items():
        if w.ndim == 3:  # (K, c_in, c_out) conv
            k = round(w.shape[0] ** (1.0 / 3.0))
            w5 = w.reshape(k, k, k, w.shape[1], w.shape[2])
            out[key] = np.ascontiguousarray(np.transpose(w5, (4, 0, 1, 2, 3)))
        elif w.ndim == 2 and ".i_branch." in key:
            out[key] = w.reshape(w.shape[0], 1, 1, 1, w.shape[1])
        else:
            out[key] = w
    for key, v in flatten_tree(state).items():
        out[key] = v
    return out
