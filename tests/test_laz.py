"""Native LASzip codec: compress/decompress roundtrips across item types,
chunk boundaries, and the full save_data/load_data path."""

import os

import numpy as np
import pytest

from treelearn_tpu.io.las import read_las, write_las
from treelearn_tpu.io.laz import (DEFAULT_CHUNK_SIZE, build_laszip_vlr,
                                  compress_points, decompress_points,
                                  items_for_point_format, parse_laszip_vlr)
from treelearn_tpu.io.pointcloud import load_data, save_data


def _forest_cloud(n, seed=0):
    """Realistically structured points: clustered xyz, few classes, treeIDs."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 100, (max(n // 500, 1), 3))
    idx = rng.integers(0, len(base), n)
    xyz = base[idx] + rng.normal(0, 0.8, (n, 3))
    xyz[:, 2] = np.abs(xyz[:, 2]) * 10
    tree_id = (idx + 1).astype(np.uint32)
    tree_id[rng.random(n) < 0.3] = 0
    return xyz, tree_id


def _roundtrip(records, items, chunk_size=DEFAULT_CHUNK_SIZE):
    blob = compress_points(records, 1234, items, chunk_size=chunk_size)
    out = decompress_points(blob, 1234, len(records), chunk_size, items)
    np.testing.assert_array_equal(out, records)
    return blob


def test_point10_roundtrip_and_compression_ratio():
    rng = np.random.default_rng(1)
    n = 3000
    xyz, _ = _forest_cloud(n, seed=1)
    rec = np.zeros((n, 20), np.uint8)
    ixyz = np.round(xyz / 0.001).astype("<i4")
    rec[:, 0:12] = ixyz.view(np.uint8).reshape(n, 12)
    rec[:, 12:14] = rng.integers(0, 500, (n, 1)).astype("<u2").view(np.uint8)
    rec[:, 14] = 0b00001001  # 1 return, first
    rec[:, 15] = rng.integers(1, 6, n)
    items = [(6, 20)]
    blob = _roundtrip(rec, items)
    # sorted-ish LiDAR data must actually compress
    assert len(blob) < 0.75 * rec.nbytes


def test_all_items_roundtrip_format3_with_extra_bytes():
    rng = np.random.default_rng(2)
    n = 1500
    xyz, tree_id = _forest_cloud(n, seed=2)
    point_len = 34 + 4
    rec = np.zeros((n, point_len), np.uint8)
    rec[:, 0:12] = np.round(xyz / 0.001).astype("<i4").view(np.uint8).reshape(n, 12)
    rec[:, 14] = 0b00001001
    rec[:, 15] = rng.integers(0, 3, n)
    # gps time: slowly increasing doubles
    gps = (1e9 + np.cumsum(rng.random(n) * 1e-4)).astype("<f8")
    rec[:, 20:28] = gps.view(np.uint8).reshape(n, 8)
    rgb = rng.integers(0, 65536, (n, 3)).astype("<u2")
    rec[:, 28:34] = rgb.view(np.uint8).reshape(n, 6)
    rec[:, 34:38] = tree_id.astype("<u4").view(np.uint8).reshape(n, 4)
    items = items_for_point_format(3, 4)
    _roundtrip(rec, items)


def test_chunk_boundaries_and_small_counts():
    rng = np.random.default_rng(3)
    items = [(6, 20)]
    for n in (1, 2, 7, 100, 101):
        rec = np.zeros((n, 20), np.uint8)
        rec[:, 0:12] = rng.integers(-10000, 10000, (n, 3)).astype(
            "<i4").view(np.uint8).reshape(n, 12)
        rec[:, 14] = 0b00001001
        _roundtrip(rec, items, chunk_size=50)  # multiple chunks at n=101


def test_adversarial_random_records():
    """Fully random bytes in every field (worst case for every model)."""
    rng = np.random.default_rng(4)
    n = 400
    rec = rng.integers(0, 256, (n, 34 + 3), dtype=np.uint8)
    rec[:, 14] = (rng.integers(1, 6, n) | (rng.integers(1, 6, n) << 3)
                  | (rng.integers(0, 2, n) << 6)).astype(np.uint8)
    items = items_for_point_format(3, 3)
    _roundtrip(rec, items, chunk_size=128)


def test_vlr_payload_roundtrip():
    items = items_for_point_format(3, 4)
    payload = build_laszip_vlr(items, chunk_size=4242)
    chunk_size, parsed = parse_laszip_vlr(payload)
    assert chunk_size == 4242
    assert [(t, s) for t, s, _ in parsed] == items
    assert all(v == 2 for _, _, v in parsed)


def test_write_read_laz_file(tmp_path):
    xyz, tree_id = _forest_cloud(5000, seed=5)
    path = str(tmp_path / "cloud.laz")
    write_las(path, xyz, classification=np.where(tree_id == 0, 2, 4).astype(np.uint8),
              extra={"treeID": tree_id})
    las = read_las(path)
    np.testing.assert_allclose(las.xyz, xyz, atol=0.0011)
    np.testing.assert_array_equal(las.treeID, tree_id)
    # compressed output is genuinely smaller than the raw LAS encoding
    las_path = str(tmp_path / "cloud.las")
    write_las(las_path, xyz, extra={"treeID": tree_id})
    assert os.path.getsize(path) < 0.8 * os.path.getsize(las_path)


def test_save_load_data_laz_parity(tmp_path):
    xyz, tree_id = _forest_cloud(2000, seed=6)
    data = np.hstack([xyz, tree_id[:, None].astype(np.float64)])
    save_data(data, "laz", "plot", str(tmp_path), use_offset=False)
    back = load_data(str(tmp_path / "plot.laz"))
    np.testing.assert_allclose(back[:, :3], xyz, atol=0.0011)
    # For-Instance convention: treeID != 0 -> id; classification 2 -> 0
    want = np.where(tree_id == 0, 0, tree_id)
    np.testing.assert_array_equal(back[:, 3], want)
