"""Probe: does Mosaic lower a per-lane dynamic gather (take_along_axis on
the lane axis) on this jax/libtpu build?  If yes, the banded conv's 4-phase
select (the single largest kernel cost, ~65% of L0 conv time) collapses to
one gather op.

Also probes pltpu.roll with a dynamic per-call shift and a sublane gather.

Usage: python scripts/probe_lane_gather.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, L, OUT = 256, 128, 96


def k_take(g_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(g_ref[:], idx_ref[:], axis=1)


def k_take_bf16(g_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(g_ref[:], idx_ref[:], axis=1)


def k_phase4(g_ref, ph_ref, out_ref):
    # the production-style 4-phase select for timing comparison
    g = g_ref[:]
    ph = ph_ref[:]
    c = 32
    sel = jnp.zeros((T, OUT), g.dtype)
    for pv in range(4):
        blk = g[:, pv * c:(pv + 1) * c]
        wide = jnp.concatenate([blk, blk, blk], axis=1)
        sel = sel + jnp.where(ph == pv, wide, 0)
    out_ref[:] = sel


def run(kern, g, idx, interpret=False):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, OUT), g.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g, idx)


def main():
    rng = np.random.default_rng(0)
    g32 = jnp.asarray(rng.normal(size=(T, L)).astype(np.float32))
    g16 = g32.astype(jnp.bfloat16)
    # idx emulating the select: out lane l -> (ph[l//32]*32 + l%32)
    ph = rng.integers(0, 4, size=(T, 3)).astype(np.int32)
    idx = (ph[:, :, None] * 32 + np.arange(32)[None, None, :]).reshape(T, OUT)
    idxj = jnp.asarray(idx)
    want32 = np.take_along_axis(np.asarray(g32), idx, axis=1)

    for name, kern, g, want in (
        ("take_f32", k_take, g32, want32),
        ("take_bf16", k_take_bf16, g16, want32.astype(np.float32)),
    ):
        try:
            out = np.asarray(run(kern, g, idxj))
            err = np.max(np.abs(out.astype(np.float32) - want))
            print(f"{name}: OK  maxerr={err:.5f}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")

    # phase-plane variant used by k_phase4
    ph_plane = jnp.asarray(np.repeat(ph, 32, axis=1).astype(np.int32))
    try:
        out = np.asarray(run(k_phase4, g16, ph_plane))
        err = np.max(np.abs(out.astype(np.float32) - want32))
        print(f"phase4: OK  maxerr={err:.5f}")
    except Exception as e:
        print(f"phase4: FAIL {type(e).__name__}: {str(e)[:300]}")

    # timing: many iterations inside one program
    @functools.partial(jax.jit, static_argnames=("which",))
    def chain(g, idx, which, iters=3000):
        def body(i, acc):
            o = run(k_take_bf16 if which == "take" else k_phase4, g, idx)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((T, OUT), jnp.float32))

    for which, idxa in (("take", idxj), ("phase4", ph_plane)):
        try:
            jax.block_until_ready(chain(g16, idxa, which))
            t0 = time.perf_counter()
            jax.block_until_ready(chain(g16, idxa, which))
            dt = (time.perf_counter() - t0) / 3000
            print(f"{which}: {dt*1e6:.2f} us/iter")
        except Exception as e:
            print(f"{which} timing FAIL: {str(e)[:200]}")


if __name__ == "__main__":
    main()
