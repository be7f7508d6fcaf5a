"""Hashing / dedup / lookup primitives."""

import jax.numpy as jnp
import numpy as np

from treelearn_tpu.ops import SENTINEL, decode_keys, encode_keys, lookup, sort_unique


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    shape = jnp.array([50, 60, 70], jnp.int32)
    coords = np.stack(
        [
            rng.integers(0, 3, 100),
            rng.integers(0, 50, 100),
            rng.integers(0, 60, 100),
            rng.integers(0, 70, 100),
        ],
        axis=1,
    ).astype(np.int32)
    keys = encode_keys(jnp.asarray(coords), shape)
    back = decode_keys(keys, shape)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_encode_out_of_range_is_sentinel():
    shape = jnp.array([10, 10, 10], jnp.int32)
    coords = jnp.array([[0, -1, 5, 5], [0, 5, 5, 10], [0, 9, 9, 9]], jnp.int32)
    keys = encode_keys(coords, shape)
    assert keys[0] == SENTINEL
    assert keys[1] == SENTINEL
    assert keys[2] != SENTINEL


def test_sort_unique_matches_numpy():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 500, 2000).astype(np.int32)
    keys[::17] = np.iinfo(np.int32).max  # sentinel rows
    cap = 600
    unique_keys, inverse, n_unique = sort_unique(jnp.asarray(keys), cap)
    unique_keys, inverse = np.asarray(unique_keys), np.asarray(inverse)

    live = keys != np.iinfo(np.int32).max
    expect = np.unique(keys[live])
    assert int(n_unique) == len(expect)
    np.testing.assert_array_equal(unique_keys[: len(expect)], expect)
    assert (unique_keys[len(expect):] == np.iinfo(np.int32).max).all()
    # inverse maps each live row to the slot holding its key
    np.testing.assert_array_equal(unique_keys[inverse[live]], keys[live])
    assert (inverse[~live] == cap).all()


def test_lookup():
    table = jnp.asarray(np.array([3, 7, 9, 100, np.iinfo(np.int32).max], np.int32))
    queries = jnp.asarray(np.array([7, 4, 100, np.iinfo(np.int32).max], np.int32))
    out = np.asarray(lookup(table, queries))
    np.testing.assert_array_equal(out, [1, -1, 3, -1])
