"""Pallas TPU kernel for the block-ELL SpMV.

The XLA path (fem/bell.py) does a row-block gather + one batched einsum.
This kernel removes the gather entirely: neighbor-block ids are
scalar-prefetched (pltpu.PrefetchScalarGridSpec) and each x-block is read
from the VMEM-resident vector with *aligned dynamic slices*:

  * x is laid out (NB8, 128) (rows padded to a multiple of 8, the f32
    sublane tile);
  * a neighbor block j is fetched by slicing the aligned 8-row chunk
    containing it and selecting the row with a one-hot dot (Mosaic requires
    provably tile-aligned dynamic starts; the one-hot select keeps the
    whole access pattern vectorized);
  * the accumulation runs in row form against transposed value blocks:
    y_row[I] = sum_k x_row[nbr[I,k]] @ vals[I,k]^T  on the MXU.

Grid = NB8/8 groups of row-blocks; the pipeline streams vals (the large
operand) HBM->VMEM while x stays resident.

Status (measured, v5e, 12.3k dof, r2): as a STANDALONE launch the kernel
beats the XLA path 3x (1.08 ms vs 3.22 ms — fewer dispatches through the
axon tunnel), but IN-PROGRAM, inside the jitted Newton/CG loop where it
matters, it LOSES: bench 19.8 ms/step (pallas) vs 18.6 ms/step (XLA).
Two reasons: (a) pallas_call is an opaque boundary — XLA fuses the
row-gather + einsum matvec with the surrounding Dirichlet masking and CG
vector work, but cannot fuse into the kernel; (b) the wrapper's
vals-transpose/pad prologue is not hoisted out of the while_loop, so it
re-executes every CG iteration.  The only regime this kernel targets is
block-ELL meshes (<= 200k nodes; larger meshes use BCSR), so there is no
large-scale regime left where it wins — the XLA path stays the default.
Kept as a working PrefetchScalarGridSpec reference and enabled with
SHAKTI_PALLAS_SPMV=1 (see physics/residual.operator_from_values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("n_nodes", "interpret"))
def bell_matvec_pallas(vals, nbr, x, n_nodes: int, interpret: bool = False):
    """y = A x with A in block-ELL form, via the Pallas kernel.

    vals: (NB, KB, B, B); nbr: (NB, KB) int32; x: (n_nodes,).
    """
    NB, KB, B, _ = vals.shape
    NB8 = -(-NB // 8) * 8
    xpad = jnp.pad(x, (0, NB8 * B - n_nodes)).reshape(NB8, B)
    vals_t = jnp.swapaxes(vals, -1, -2)       # row-form accumulation
    if NB8 != NB:
        vals_t = jnp.pad(vals_t, ((0, NB8 - NB), (0, 0), (0, 0), (0, 0)))
        nbr = jnp.pad(nbr, ((0, NB8 - NB), (0, 0)))
    G = NB8 // 8                              # 8 row-blocks per grid step

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                # nbr ids drive the slicing
        grid=(G,),
        in_specs=[
            # x: the full padded (NB8, B) vector, VMEM-resident across grid
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, KB, B, B), lambda g, nbr: (g, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, B), lambda g, nbr: (g, 0)),
    )

    def kernel(nbr_ref, x_ref, valsT_ref, out_ref):
        g = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        for r in range(8):
            acc = jnp.zeros((1, B), dtype=jnp.float32)
            for k in range(KB):
                j = nbr_ref[(g * 8 + r) * KB + k]
                base = pl.multiple_of((j // 8) * 8, 8)
                chunk = x_ref[pl.ds(base, 8), :]              # (8, B) aligned
                sel = (lane == (j - base)).astype(jnp.float32)
                xrow = jnp.dot(sel, chunk.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # (1, B)
                acc += jnp.dot(xrow, valsT_ref[r, k],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            out_ref[r, :] = acc.reshape(B).astype(out_ref.dtype)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NB8, B), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nbr.reshape(-1), xpad, vals_t)
    return y.reshape(-1)[:n_nodes]
