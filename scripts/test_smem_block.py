"""Can a Pallas TPU kernel take a per-tile SMEM block input (pipelined)
instead of scalar-prefetching the whole array?  If yes, the banded kernels'
(9, ntiles) window-start tables stop being SMEM-resident and capacity 2^23+
whole-plot programs become possible."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"


def kernel(lo_ref, x_hbm, out_ref, scratch, sem):
    # lo_ref: (1, 8) int32 SMEM block for this tile
    start = lo_ref[0, 0]
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(start, 8), :], scratch, sem)
    cp.start()
    cp.wait()
    out_ref[:] = scratch[:] * jnp.float32(lo_ref[0, 1])


@jax.jit
def run(lo, x):
    ntiles = lo.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        out_shape=jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
        interpret=INTERPRET,
    )(lo, x)


def main():
    ntiles = 16
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 128)).astype(np.float32)
    lo = np.zeros((ntiles, 8), np.int32)
    lo[:, 0] = rng.integers(0, 256 - 8, ntiles)
    lo[:, 1] = rng.integers(1, 5, ntiles)
    out = np.asarray(run(jnp.asarray(lo), jnp.asarray(x)))
    want = np.concatenate([x[lo[t, 0]:lo[t, 0] + 8] * lo[t, 1]
                           for t in range(ntiles)])
    err = np.abs(out - want).max()
    print(f"SMEM block input works, max|err| = {err}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
