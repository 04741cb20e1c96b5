"""Probe: can a Pallas TPU kernel beat the XLA scan for the env step?

Findings on this toolchain (axon remote-compile, TPU v5e):

  * The env step is GATHER-shaped (tile-code lookup by candidate index).
    Mosaic rejects 1-D vector gathers ("Only 2D gather is supported");
    `take_along_axis` axis=0 hits an AssertionError in lowering; the
    same-shape axis=1 form lowers but the remote tpu_compile_helper crashes
    (HTTP 500). There is no viable in-kernel dynamic-gather path.
  * [CORRECTED 2026-08-18] The original conclusion here — "XLA's native
    gather is at speed-of-light, select chains are orders of magnitude
    worse" — was WRONG, built on block_until_ready timings that do not
    actually block on the axon tunnel (docs/PERFORMANCE.md §1). Honest
    fetch-fenced timing shows the opposite: XLA's dynamic gather costs
    ~565 us per 64k-element lookup on this chip, and the gather-free
    SELECT-TREE over bit-packed tile words (ops/bitplane.py) beats it by
    ~1000x at gridworld state sizes. The select tree is linear in
    ceil(S/16). [MEASURED r5, tools/crossover_probe.py] On real maze
    levels the word tree costs ~44 ns per extra word at 64k envs over a
    ~4 us floor, so the packed engine still beats the gather step 118x
    at S=4225 (the old "~16k states" guess extrapolates to a ~680k-state
    crossover — the pack_level cap at 16,384 states is a program-size
    guard, not a performance cliff).

Conclusion: still no Pallas step kernel, but for a different reason than
first recorded: the gather-free bitplane engine already fuses into plain
XLA at ~2.6 us per 64k-env step, and Mosaic's gather gaps + remote-compile
crashes (above) close off the main thing a hand kernel could try
differently. Revisit if state grows past VMEM (per-env mega-grids, DMA
double-buffering) or the Mosaic gather gap closes.

Run me to re-test the toolchain:  python tools/pallas_probe.py
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_gather_1d():
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = table_ref[:][idx_ref[:]]

    table = jnp.arange(256, dtype=jnp.int32)
    idx = jnp.zeros((8, 128), jnp.int32)
    try:
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)
        return "OK"
    except Exception as e:
        return f"{type(e).__name__}: {str(e)[:120]}"


def probe_take_along_axis():
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=1)

    table = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (8, 256))
    idx = jnp.zeros((8, 256), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)
        np.asarray(out)
        return "OK"
    except Exception as e:
        return f"{type(e).__name__}: {str(e)[:120]}"


if __name__ == "__main__":
    print("1-D vector gather:", probe_gather_1d())
    print("2-D take_along_axis:", probe_take_along_axis())
