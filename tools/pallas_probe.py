"""Probe: can a Pallas TPU kernel beat the XLA scan for the env step?

Findings on this toolchain (axon remote-compile, TPU v5e, 2026-08-17):

  * The env step is GATHER-shaped (tile-code lookup by candidate index).
    Mosaic rejects 1-D vector gathers ("Only 2D gather is supported");
    `take_along_axis` axis=0 hits an AssertionError in lowering; the
    same-shape axis=1 form lowers but the remote tpu_compile_helper crashes
    (HTTP 500). There is no viable in-kernel dynamic-gather path.
  * Gather-free alternatives (one-hot × table on the MXU, select chains)
    cost ≥S VPU-ops per lookup — orders of magnitude more than the native
    gather XLA emits.
  * Roofline check of the XLA path (bench.py cfg4: ~8e10 env-steps/s at
    64k envs): per-step per-env work is ~40 VPU ops (threefry randint +
    index arithmetic + 2 gathers + where-chains) → ~3.2 Tops/s sustained,
    i.e. at the v5e VPU's peak; the loop-carried state (~1 MB at 64k envs)
    stays VMEM-resident across the scan, so there is no HBM traffic to
    save. XLA is already at speed-of-light for this kernel shape
    (SURVEY.md §2.2 predicted exactly this).

Conclusion: no Pallas step kernel — revisit only if the state grows past
VMEM (e.g. per-env mega-grids) where a double-buffered DMA pipeline would
pay, or if the Mosaic gather gap closes.

Run me to re-test the toolchain:  python tools/pallas_probe.py
"""

import traceback

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
