"""Pallas bilinear-warp kernel for the Farneback matrix update.

The flow bottleneck on TPU is the bilinear warp gather in
``_update_matrices`` (XLA's gather is index-bound: ~60M indices/s on v5e,
~500 ms per 16x540p call).  This kernel does the warp with Mosaic's hardware
``dynamic_gather`` (lowered from in-kernel ``jnp.take_along_axis``):

For each 8-row output block and each plane:
- DMA a K-row window of the source plane around the block (double use of the
  exact 2-step gather decomposition):
- per output row: ONE lane gather aligns columns
  (G[r, j] = window[r, xi[j]]; the index row is broadcast over window rows),
  then ONE sublane gather picks the row (out[j] = G[yi_local[j], j]).
  Both are exact; packing yi and yi+1 into two index rows yields both
  vertical corners from a single sublane gather.

Row displacements are clamped to the window (default +-28 rows around the
block): exact for |dy| <= 28, clamped beyond — flows that large are garbage
for 16x16 patch scoring anyway and the XLA path is available for strict
parity (``relaxtpu.ops.flow`` uses it by default).

NOTE: this environment's remote Mosaic compile helper crashes on
``dynamic_gather`` (trivial kernels compile fine), so ``available()`` probes
once at runtime and callers fall back to the XLA warp.  The kernel is
validated in interpreter mode (tests/test_warp_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8
WINDOW = 64  # K rows staged in VMEM per block; dy clamp = (WINDOW - BLOCK_ROWS) // 2


def _warp_kernel(flow_ref, planes_hbm, out_ref, window, sem):
    """grid = (n_planes, H // BLOCK_ROWS).

    flow_ref: (2, BLOCK_ROWS, W) VMEM — this block's flow rows
    planes_hbm: (n_planes, H, W) ANY — source planes
    out_ref: (BLOCK_ROWS, W) VMEM — warped plane rows for this block
    window: (WINDOW, W) VMEM scratch
    """
    p = pl.program_id(0)
    blk = pl.program_id(1)
    n_rows = planes_hbm.shape[1]
    w = planes_hbm.shape[2]

    y0 = blk * BLOCK_ROWS
    margin = (WINDOW - BLOCK_ROWS) // 2
    wstart = jnp.clip(y0 - margin, 0, n_rows - WINDOW)

    dma = pltpu.make_async_copy(
        planes_hbm.at[p, pl.ds(wstart, WINDOW), :], window, sem
    )
    dma.start()

    dx = flow_ref[0]
    dy = flow_ref[1]
    cols = jax.lax.broadcasted_iota(jnp.float32, (BLOCK_ROWS, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (BLOCK_ROWS, w), 0) + y0
    fx = cols + dx
    fy = rows + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = fx - x1
    ty = fy - y1
    xi = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    yl = jnp.clip(y1.astype(jnp.int32) - wstart, 0, WINDOW - 2)

    dma.wait()
    win = window[:]

    def one_row(i, acc):
        # lane-align columns: G[r, j] = win[r, xi[i, j]] (index row broadcast)
        xi_row = jax.lax.dynamic_slice(xi, (i, 0), (1, w))
        xi_b = jnp.broadcast_to(xi_row, (WINDOW, w))
        g0 = jnp.take_along_axis(win, xi_b, axis=1)
        g1 = jnp.take_along_axis(win, jnp.minimum(xi_b + 1, w - 1), axis=1)
        # sublane-align rows: rows 0/1 of the index matrix pick yl and yl+1
        yl_row = jax.lax.dynamic_slice(yl, (i, 0), (1, w))
        idx2 = jnp.concatenate(
            [yl_row, yl_row + 1, jnp.zeros((WINDOW - 2, w), jnp.int32)], axis=0
        )
        p00_10 = jnp.take_along_axis(g0, idx2, axis=0)
        p01_11 = jnp.take_along_axis(g1, idx2, axis=0)
        tx_r = jax.lax.dynamic_slice(tx, (i, 0), (1, w))[0]
        ty_r = jax.lax.dynamic_slice(ty, (i, 0), (1, w))[0]
        top = p00_10[0] * (1 - tx_r) + p01_11[0] * tx_r
        bot = p00_10[1] * (1 - tx_r) + p01_11[1] * tx_r
        out_ref[0, i, :] = top * (1 - ty_r) + bot * ty_r
        return acc

    jax.lax.fori_loop(0, BLOCK_ROWS, one_row, 0)


def warp_planes_pallas(planes: jax.Array, flow: jax.Array, interpret: bool = False) -> jax.Array:
    """(C, H, W) planes + (2, H, W) flow -> (C, H, W) bilinear-warped planes.

    Matches the XLA warp for |dy| <= (WINDOW - BLOCK_ROWS)//2; rows beyond
    clamp to the window edge.  H must be a multiple of BLOCK_ROWS and
    >= WINDOW.
    """
    c, h, w = planes.shape
    assert h % BLOCK_ROWS == 0 and h >= WINDOW, (h, w)

    grid = (c, h // BLOCK_ROWS)
    return pl.pallas_call(
        _warp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, BLOCK_ROWS, w), lambda p, b: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_ROWS, w), lambda p, b: (p, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), planes.dtype),
        scratch_shapes=[
            pltpu.VMEM((WINDOW, w), planes.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(flow, planes)


@functools.lru_cache(maxsize=1)
def available() -> bool:
    """Probe whether Mosaic dynamic_gather compiles in this environment."""
    try:
        x = jnp.zeros((2, BLOCK_ROWS * 8, 256), jnp.float32)
        f = jnp.zeros((2, BLOCK_ROWS * 8, 256), jnp.float32)
        np.asarray(warp_planes_pallas(x, f))
        return True
    except Exception:
        return False
