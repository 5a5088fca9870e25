"""Fused box-blur + 2x2 flow solve as a Pallas VMEM-resident kernel.

The Farneback displacement update box-sums the five normal-equation planes
M = [G11, G12, G22, h1, h2] over winsize x winsize (replicate border) and
solves the 2x2 system per pixel (ref: the blur+solve inside OpenCV's
FarnebackUpdateFlow_Blur, driven from ``cv2.calcOpticalFlowFarneback`` at
``/root/reference/src/main_fragment_layerstack.py:313-315``).

The XLA forms sit well off the HBM roofline: the dense Toeplitz MXU matmuls
(round 3's best) cost two full HBM round-trips of the 5-plane M between the
vertical and horizontal passes plus a third read for the solve; VPU
shifted-add forms materialize every intermediate.  This kernel keeps the
whole pipeline in VMEM per row-slab: DMA a (5, slab + 2*halo, Wp) window
in, 2*(winsize-1) adds per element on the VPU (vertical static slices,
horizontal lane rolls over edge-padded columns), solve, and write only the
(2, slab, Wp) flow block out.  HBM traffic drops to read-M-once +
write-flow-once, and the MXU stays free for the warp matmuls that overlap
in the surrounding program.

MEASURED RESULT (v5e, 16-pair 540p, scripts/flow_roofline.py, r4): 6.64 ms
vs 4.87 ms for the XLA Toeplitz box-blur+solve — the kernel LOSES despite
doing ~2.5x less HBM traffic, because the 2*(winsize-1) = 28 lane
``pltpu.roll``s per element run as VPU cross-lane permutes, which cost more
than the MXU matmuls they replace (the Toeplitz form's structural-zero
FLOPs are free: it is nowhere near the MXU peak).  XLA remains the only
dispatch target (``flow._update_flow``); this kernel stays as the measured
alternative, correctness-pinned by the interpret tests and the TPU-gated
compiled test in tests/test_flow.py.

Numerics: plain f32 adds in a different association order than the Toeplitz
matmul; the difference is at the f32 rounding floor and is covered by the
flow-vs-cv2 parity tests (interior tolerance 0.05 px; kernel-vs-XLA
agreement asserted directly in tests/test_flow.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_RB = 8  # f32 sublane tile: row offsets must stay 8-aligned for the DMA


def _box_solve_kernel(m_hbm, out_ref, win, sem, *, r: int, slab: int,
                      halo: int, inv_area: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # grid (batch, slabs): Mosaic only accepts ANY-space inputs passed whole
    # (vmap over pallas_call folds the batch into the BlockSpec and is
    # rejected), so the batch axis is a grid dimension indexed manually.
    b = pl.program_id(0)
    row0 = pl.program_id(1) * slab  # slab is a multiple of 8: provably tiled
    dma = pltpu.make_async_copy(
        m_hbm.at[b, :, pl.ds(row0, slab + 2 * halo), :], win, sem
    )
    dma.start()
    dma.wait()

    # Vertical box sum: v[i] = sum_{d=0..2r} win[base + i + d] with
    # base = halo - r (window centred on the output row).  Static slices,
    # all VMEM-resident.
    base = halo - r
    v = win[:, base : base + slab, :]
    for d in range(1, 2 * r + 1):
        v = v + win[:, base + d : base + d + slab, :]

    # Horizontal box sum via lane rolls.  Columns were edge-padded by r and
    # zero-extended to the lane tile in the wrapper, so every output column
    # c in [r, r + W) reads only valid padded lanes ([c - r, c + r] stays
    # inside [0, 2r + W)); the circular wrap of roll only contaminates lanes
    # outside that range, which the wrapper slices off.
    hs = v
    lanes = win.shape[2]
    for j in range(1, r + 1):
        # pltpu.roll requires shift >= 0; roll(v, -j) == roll(v, lanes - j)
        # on the circular lane axis.
        hs = (
            hs
            + pltpu.roll(v, shift=j, axis=2)
            + pltpu.roll(v, shift=lanes - j, axis=2)
        )

    g11 = hs[0] * inv_area
    g12 = hs[1] * inv_area
    g22 = hs[2] * inv_area
    h1 = hs[3] * inv_area
    h2 = hs[4] * inv_area
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)  # same eps as the XLA solve
    out_ref[0, 0, :, :] = (g11 * h2 - g12 * h1) * idet
    out_ref[0, 1, :, :] = (g22 * h1 - g12 * h2) * idet


@functools.partial(jax.jit, static_argnames=("winsize", "slab", "interpret"))
def box_blur_solve_pallas(
    m: jax.Array, winsize: int = 15, slab: int = 64, interpret: bool = False
) -> jax.Array:
    """Fused ``_box_blur`` + ``_update_flow`` solve: (5, H, W) or
    (P, 5, H, W) M planes -> (2, H, W) / (P, 2, H, W) flow.  Equivalent to
    ``flow._update_flow(m, winsize)`` up to f32 summation order.

    Batch is a native grid axis (grid = (P, slabs)) rather than ``vmap``:
    Mosaic requires ANY-memory-space operands passed whole, and vmap over
    pallas_call folds the batch into the BlockSpec, which it rejects.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert winsize % 2 == 1, "box window must be odd"
    squeeze = m.ndim == 3
    if squeeze:
        m = m[None]
    p, c, h, w = m.shape
    assert c == 5, "M must be the 5 normal-equation planes"
    r = winsize // 2
    halo = _RB * math.ceil(r / _RB)
    n_slabs = math.ceil(h / slab)
    hs = n_slabs * slab
    wp = 128 * math.ceil((w + 2 * r) / 128)

    # rows: halo edge rows on top, (hs - h + halo) on the bottom (edge);
    # cols: r edge lanes each side, zero-extend to the lane tile.
    mp = jnp.pad(m, ((0, 0), (0, 0), (halo, hs - h + halo), (r, r)), mode="edge")
    mp = jnp.pad(mp, ((0, 0), (0, 0), (0, 0), (0, wp - (w + 2 * r))))

    kernel = functools.partial(
        _box_solve_kernel, r=r, slab=slab, halo=halo,
        inv_area=1.0 / float(winsize * winsize),
    )
    out = pl.pallas_call(
        kernel,
        grid=(p, n_slabs),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2, slab, wp), lambda b, s: (b, 0, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((p, 2, hs, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, slab + 2 * halo, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mp)
    out = out[:, :, :h, r : r + w]
    return out[0] if squeeze else out
