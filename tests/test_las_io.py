"""LAS codec and load_data/save_data parity tests."""

import numpy as np

from treelearn_tpu.io import load_data, save_data
from treelearn_tpu.io.las import read_las, write_las


def test_las_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-50, 50, size=(1000, 3))
    tree_id = rng.integers(0, 10, size=1000).astype(np.uint32)
    classification = np.where(tree_id == 0, 2, 4).astype(np.uint8)
    rgb = rng.integers(0, 255, size=(1000, 3)).astype(np.uint16)

    path = str(tmp_path / "cloud.las")
    write_las(path, xyz, classification=classification, rgb=rgb,
              extra={"treeID": tree_id})

    las = read_las(path)
    np.testing.assert_allclose(las.xyz, xyz, atol=1e-3)  # mm scale quantization
    np.testing.assert_array_equal(las.classification, classification)
    np.testing.assert_array_equal(las.treeID, tree_id)
    np.testing.assert_array_equal(las.rgb, rgb)


def test_load_data_las_forinstance_convention(tmp_path):
    """treeID != 0 -> instance id; classification in {1,2} -> 0; else -> -1
    (reference data_preparation.py:34-47)."""
    xyz = np.array([[0.0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3]])
    tree_id = np.array([5, 0, 0, 9], dtype=np.uint32)
    classification = np.array([4, 2, 7, 4], dtype=np.uint8)
    path = str(tmp_path / "t.las")
    write_las(path, xyz, classification=classification, extra={"treeID": tree_id})

    data = load_data(path)
    assert data.shape == (4, 4)
    np.testing.assert_array_equal(data[:, 3], [5, 0, -1, 9])


def test_load_data_npz_and_3col(tmp_path):
    pts = np.random.rand(10, 3)
    labels = np.arange(10).astype(float)
    np.savez(tmp_path / "a.npz", points=pts, labels=labels)
    data = load_data(str(tmp_path / "a.npz"))
    np.testing.assert_allclose(data[:, :3], pts)
    np.testing.assert_allclose(data[:, 3], labels)

    np.save(tmp_path / "b.npy", pts)
    data = load_data(str(tmp_path / "b.npy"))
    np.testing.assert_array_equal(data[:, 3], -1)


def test_save_data_las_labels(tmp_path):
    data = np.hstack([np.random.rand(20, 3) * 10, np.repeat([0, 3], 10)[:, None]])
    save_data(data, "las", "out", str(tmp_path))
    las = read_las(str(tmp_path / "out.las"))
    np.testing.assert_array_equal(las.treeID, data[:, 3].astype(np.uint32))
    # For-Instance codes: non-tree -> 2 (terrain), tree -> 4 (stem)
    np.testing.assert_array_equal(las.classification, np.repeat([2, 4], 10))
    # non-tree points colored black
    assert (las.rgb[:10] == 0).all()
