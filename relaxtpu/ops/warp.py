"""Banded bilinear warp as one-hot matmuls on the MXU (no gather).

The Farneback matrix update warps the next-frame polynomial-expansion planes
by the current flow (ref: the warp inside OpenCV's FarnebackUpdateMatrices,
driven from ``cv2.calcOpticalFlowFarneback`` at
``/root/reference/src/main_fragment_layerstack.py:313-315``).  A direct XLA
gather is index-bound on TPU (~60M indices/s): it was ~90% of the whole VQA
pipeline.  Mosaic's hardware ``dynamic_gather`` cannot express it either —
the gather dimension spans multiple vregs ("Not implemented: Multiple source
vregs along gather dimension").

This module reformulates the warp so the hot step runs on the MXU:

- Output rows are processed in blocks of 8, columns in 128-lane blocks.
  Each row-block reads a K-row source window centred on the row-block's
  MEAN vertical displacement (one shared traced offset — the row slice was
  already a dynamic_slice, so this is free), making any coherent vertical
  motion exact; rows deviating more than (K-8)//2 from the block mean clamp.
  Columns use static slabs with a +-band halo: |dx| <= band is exact, and
  the default band of 64 exceeds the ~52 px composite displacement that
  Farneback with the reference parameters can track at all (the widening
  from 32 costs ~12% on the MXU — measured 20.4 -> 23.0 ms per 16-pair 540p
  call; per-column-block adaptive windows were measured 2x slower, 39.7 ms,
  because ncb separate unaligned dynamic slices defeat XLA's copy fusion).
  The exact-gather path remains available for strict parity.
- Horizontal alignment of the whole window is ONE matmul per (row-block,
  col-block): ``G[r, j] = sum_u win[r, u] * M[u, j]`` where
  ``M[u, j] = (1-tx_j)*[u == xi_j] + tx_j*[u == xi_j + 1]`` — a banded
  one-hot matrix with the x-interpolation folded in.  Each output element has
  exactly one or two nonzero contraction terms, so there is no accumulation
  error; operand rounding is controlled by ``precision``.  DEFAULT (1-pass
  bf16 on TPU) is the default: measured flow error vs cv2 is ~2e-4 px mean
  (150x under the 0.05 px parity tolerance; HIGH reaches ~1e-6 at 3x the
  matmul cost) — pass HIGH/HIGHEST for strict work.
- Vertical interpolation is a 2-tap one-hot mask reduce over the K window
  rows (VPU, negligible cost).

Cost at 540p (5 planes, K=40, band=64): ~28 G-MAC per warp call — measured
16.5 ms per 16-pair batch on a tunneled v5e (K=72: 22.4 ms) vs ~35+ ms for
ONE XLA gather call it replaces.  Runtime is bound by CONSTRUCTING the
one-hot M on the VPU (~36G iota-compare/select elements per 16-pair call),
not FLOPs or HBM: window 72 -> 24 cuts FLOPs 3x but time only 1.5x, and
storing G in bf16 (halving its HBM round-trip) measured 17.10 vs 17.16 ms —
no change, so the f32 G stays.  K=40 (margin 16 rows around the
row-block mean dy) still tracks a 2 deg/frame rotation at 960 px wide — the
validated robustness floor (K=32 fails it; see scripts/exp_warp_cfg.py).
Column-adaptive slabs (mean-dx folded into the dynamic slice) were measured
and rejected: the lane-dimension dynamic slice costs more than the smaller
band saves (17.5 ms at band=32+adaptive vs 16.5 at static band=64).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_B = 8  # output row-block (f32 sublane tile)
_CB = 128  # output column-block (lane tile)


@functools.partial(
    jax.jit, static_argnames=("band", "window", "precision", "col_adaptive", "m_form")
)
def warp_planes_banded_xla(
    planes: jax.Array,
    flow: jax.Array,
    band: int = 64,
    window: int = 40,
    precision=None,
    col_adaptive: bool = False,
    m_form: str = "select",
) -> jax.Array:
    """Bilinear-warp ``planes`` (C, H, W) by ``flow`` (2, H, W) -> (C, H, W).

    ``precision=None`` defers to ``jax_default_matmul_precision``: unset (the
    production path) that is DEFAULT = 1-pass bf16 operands on the MXU (the
    measured ~2e-4 px flow error documented above); the test conftest pins
    the config to "highest" so the f32 indexing/banding oracle tests are
    exact on TPU hardware too.  Pass an explicit Precision to override both.

    Matches ``planes[c, clip(y+dy), clip(x+dx)]`` bilinear sampling (corner
    indices clipped to [0, H-2] / [0, W-2] like the exact path) wherever
    |dx| <= band AND dy is within (window-8)//2 of its row-block's mean
    vertical displacement (the source row window is centred on that mean, so
    coherent vertical motion of any magnitude is exact).  Beyond that the
    source index clamps to the window edge.  Out-of-image samples are the
    caller's concern (the Farneback update masks them via its ``inside``
    test).

    ``col_adaptive``: additionally centre the column slabs on the row-block's
    mean HORIZONTAL displacement (one traced column offset folded into the
    same dynamic_slice that already applies the row offset).  Coherent pans
    of any magnitude then stay exact and ``band`` only needs to cover the
    WITHIN-row-block spread of dx (zoom/rotation shear), so it can shrink —
    the matmul contraction length is CB + 2*band.

    ``m_form`` selects how the one-hot interpolation masks are built (the
    warp's measured bound is this VPU construction, not the matmul):
    'select' = two int compares + two selects + add; 'tent' = recompose the
    clipped corner index with the fraction and evaluate the bilinear weight
    as a tent function ``max(1 - |u - (xi + t)|, 0)`` — ONE fused f32
    elementwise chain, no compares/selects.  Identical results up to one f32
    rounding (the corner clamp and fraction are shared by construction).
    """
    c, h, w = planes.shape
    k = max(_B, min(window, h))
    margin = (k - _B) // 2
    nb = math.ceil(h / _B)
    hp = nb * _B
    ncb = math.ceil(w / _CB)
    wp = ncb * _CB
    cbh = min(_CB + 2 * band, wp)

    # Per-pixel corner indices / fractions in global coordinates.
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs + flow[0]
    fy = ys + flow[1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = (fx - x1).astype(jnp.float32)
    ty = (fy - y1).astype(jnp.float32)
    xi = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y1.astype(jnp.int32), 0, h - 2)

    def blocked(a):
        a = jnp.pad(a, ((0, hp - h), (0, wp - w)))
        return a.reshape(nb, _B, ncb, _CB)

    xi_b, yi_b, tx_b, ty_b = blocked(xi), blocked(yi), blocked(tx), blocked(ty)

    # Per-row-block mean vertical displacement (nb,): the row window is
    # centred on it, so coherent vertical motion of any size stays exact.
    # Edge-pad before reducing (zero padding would dilute edge-block means
    # toward 0, eating the margin headroom).  One shared traced offset per
    # row-block — per-column-block windows were measured 2x slower (ncb
    # unaligned dynamic slices defeat XLA's copy fusion).
    dy_pad = jnp.pad(jnp.nan_to_num(flow[1]), ((0, hp - h), (0, wp - w)), mode="edge")
    dy_base = jnp.round(jnp.mean(dy_pad.reshape(nb, _B * wp), axis=1)).astype(jnp.int32)

    # Static schedules: row starts UNCLIPPED (the dy base is added first and
    # the sum clipped, so edge blocks keep their margin under displacement);
    # column-slab starts static and pre-clipped.
    wstarts = (np.arange(nb) * _B - margin).astype(np.int32)
    cstarts = np.clip(np.arange(ncb) * _CB - band, 0, wp - cbh)

    # Source padded to the slab grid; edge mode so band-clamped samples read
    # replicated real pixels, not zeros.
    _CP = 128  # column-offset headroom when col_adaptive
    cpad = _CP if col_adaptive else 0
    planes_p = jnp.pad(
        planes, ((0, 0), (0, 0), (cpad, cpad + wp - w)), mode="edge"
    )
    if col_adaptive:
        dx_pad = jnp.pad(
            jnp.nan_to_num(flow[0]), ((0, hp - h), (0, wp - w)), mode="edge"
        )
        dx_base = jnp.clip(
            jnp.round(jnp.mean(dx_pad.reshape(nb, _B * wp), axis=1)).astype(jnp.int32),
            -_CP,
            _CP,
        )
    else:
        dx_base = jnp.zeros((nb,), jnp.int32)

    iota_dt = jnp.float32 if m_form == "tent" else jnp.int32
    u_iota = jax.lax.broadcasted_iota(iota_dt, (1, 1, cbh, 1), 2)
    r_iota = jax.lax.broadcasted_iota(iota_dt, (1, 1, k, 1), 2)
    cstart_arr = jnp.asarray(cstarts, jnp.int32)[None, :, None]

    def body(_, xs_blk):
        wstart, xi_k, yi_k, tx_k, ty_k, dyb, dxb = xs_blk
        rstart = jnp.clip(wstart + dyb, 0, h - k)
        win = jax.lax.dynamic_slice(planes_p, (0, rstart, cpad + dxb), (c, k, wp))
        win_c = jnp.stack(
            [jax.lax.slice(win, (0, 0, cs), (c, k, cs + cbh)) for cs in cstarts]
        )  # (ncb, C, K, CBh)

        xi_loc = jnp.clip(xi_k - dxb - cstart_arr, 0, cbh - 2)[:, :, None, :]
        txe = tx_k[:, :, None, :]
        if m_form == "tent":
            m = jnp.maximum(1.0 - jnp.abs(u_iota - (xi_loc.astype(jnp.float32) + txe)), 0.0)
        else:
            m = jnp.where(u_iota == xi_loc, 1.0 - txe, 0.0) + jnp.where(
                u_iota == xi_loc + 1, txe, 0.0
            )  # (B, ncb, CBh, CB)

        # Explicit bf16 staging of m/win_c/G was measured and REVERTED: at
        # DEFAULT precision XLA already feeds the dot bf16 operands, so
        # forcing the cast saved nothing on TPU (22.4 vs 21.6 ms) and would
        # change CPU numerics (CPU DEFAULT dots are f32).
        g = jnp.einsum(
            "npru,inuj->inprj",
            win_c,
            m,
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (B, ncb, C, K, CB)

        yl = jnp.clip(yi_k - rstart, 0, k - 2)[:, :, None, :]
        tye = ty_k[:, :, None, :]
        if m_form == "tent":
            wv = jnp.maximum(1.0 - jnp.abs(r_iota - (yl.astype(jnp.float32) + tye)), 0.0)
        else:
            wv = jnp.where(r_iota == yl, 1.0 - tye, 0.0) + jnp.where(
                r_iota == yl + 1, tye, 0.0
            )  # (B, ncb, K, CB)
        out = jnp.einsum("inrj,inprj->inpj", wv, g)  # (B, ncb, C, CB)
        return None, out

    _, rows = jax.lax.scan(
        body, None,
        (jnp.asarray(wstarts), xi_b, yi_b, tx_b, ty_b, dy_base, dx_base),
    )  # (nb, B, ncb, C, CB)
    out = rows.transpose(3, 0, 1, 2, 4).reshape(c, hp, wp)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# Fused Pallas variant: same banded one-hot formulation, but the horizontally
# aligned window G never leaves VMEM (the XLA scan materializes ~K/8 x the
# output in HBM between the matmul and the vertical reduce).  No gather, no
# value-indexed dynamic_slice — only iota/compare/select, MXU dots, static
# unrolled loops, and explicitly scheduled window DMAs, all of which Mosaic
# lowers today (its hardware dynamic_gather cannot span vregs, so the gather
# formulation is out of reach on TPU).
# ---------------------------------------------------------------------------


def _warp_kernel(xi_ref, yi_ref, tx_ref, ty_ref, planes_hbm, out_ref, win, sem):
    from jax.experimental import pallas as pl  # deferred: keep module import cheap
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    c, hp, wp = planes_hbm.shape
    k = win.shape[1]
    cbh = win.shape[2]  # 2 adjacent lane blocks: own + left neighbour
    margin = (k - _B) // 2  # multiple of 8 by construction
    blk = pl.program_id(0)
    cb = pl.program_id(1)

    # Mosaic must PROVE DMA offsets divisible by the (8, 128) tile, so the
    # offsets are computed in whole-tile units and scaled (a clipped
    # byte-offset expression defeats its divisibility analysis).
    wstart = jnp.clip(blk - margin // _B, 0, (hp - k) // _B) * _B
    cstart = jnp.clip(cb - 1, 0, (wp - cbh) // _CB) * _CB
    dma = pltpu.make_async_copy(
        planes_hbm.at[:, pl.ds(wstart, k), pl.ds(cstart, cbh)], win, sem
    )
    dma.start()

    u_iota = jax.lax.broadcasted_iota(jnp.int32, (cbh, _CB), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (k, _CB), 0)

    dma.wait()
    # Exact-bf16 4-pass decomposition (Mosaic's f32 dot is a 6-pass; it has
    # no 3-pass option).  The one-hot matrix E0 = [u == xi] is bf16-EXACT;
    # the x-interpolation factors out of the matmul column-wise
    # (G = G0 + tx*(G1 - G0)); G1's one-hot at xi+1 is G0's applied to a
    # lane-shifted window; and the f32 window splits exactly into a bf16
    # hi/lo pair.  Stacking [hi; lo; hi_s; lo_s] for all planes makes the
    # whole thing ONE default-precision bf16 matmul per output row, with
    # every contraction having exactly one nonzero product — no rounding
    # beyond the hi/lo split (~2^-16 relative).
    w32 = win[:]  # (C, K, CBh) f32
    w32s = jnp.concatenate([w32[:, :, 1:], w32[:, :, -1:]], axis=-1)
    hi = w32.astype(jnp.bfloat16)
    lo = (w32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    his = w32s.astype(jnp.bfloat16)
    los = (w32s - his.astype(jnp.float32)).astype(jnp.bfloat16)
    stacked = jnp.concatenate(
        [hi.reshape(c * k, cbh), lo.reshape(c * k, cbh),
         his.reshape(c * k, cbh), los.reshape(c * k, cbh)], axis=0
    )  # (4*C*K, CBh) bf16

    for i in range(_B):  # static unroll over the 8 output rows
        xi_loc = jnp.clip(xi_ref[i : i + 1, :] - cstart, 0, cbh - 2)  # (1, CB)
        txr = tx_ref[i : i + 1, :]
        e0 = jnp.where(u_iota == xi_loc, 1.0, 0.0).astype(jnp.bfloat16)
        o4 = jax.lax.dot_general(
            stacked, e0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(4, c, k, _CB)
        g0 = o4[0] + o4[1]
        g1 = o4[2] + o4[3]
        g = g0 + txr * (g1 - g0)  # (C, K, CB)

        yl = jnp.clip(yi_ref[i : i + 1, :] - wstart, 0, k - 2)  # (1, CB)
        tyr = ty_ref[i : i + 1, :]
        wv = jnp.where(r_iota == yl, 1.0 - tyr, 0.0) + jnp.where(
            r_iota == yl + 1, tyr, 0.0
        )  # (K, CB)
        out_ref[:, i, :] = jnp.sum(g * wv[None], axis=1)


def warp_planes_banded_pallas(
    planes: jax.Array,
    flow: jax.Array,
    window: int = 72,
    interpret: bool = False,
) -> jax.Array:
    """Pallas version of :func:`warp_planes_banded_xla`.

    Exact band: dy in [-margin, margin+7] with margin = (window-8)//2, dx in
    [-127, +127] (the column slab is the output's own 128-lane block plus
    both neighbours, clipped at the image edges — wider than the XLA
    version's +-band).  Beyond-band displacements clamp to the slab edge.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, h, w = planes.shape
    nb = math.ceil(h / _B)
    hp = nb * _B
    ncb = math.ceil(w / _CB)
    wp = ncb * _CB
    # window rows: k = 8 + 2*margin with margin a multiple of 8, k <= hp
    margin = max(0, min((window - _B) // 2, (hp - _B) // 2)) // _B * _B
    k = _B + 2 * margin
    # column slab: the output's own 128-lane block plus BOTH neighbours, so
    # every output column has >= 127 exact columns of headroom on each side
    # (DMA offsets must be 128-aligned, ruling out a tighter centred halo).
    cbh = min(3 * _CB, wp)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs + flow[0]
    fy = ys + flow[1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = (fx - x1).astype(jnp.float32)
    ty = (fy - y1).astype(jnp.float32)
    xi = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y1.astype(jnp.int32), 0, h - 2)

    def padded(a):
        return jnp.pad(a, ((0, hp - h), (0, wp - w)))

    # rows padded too: keeps every DMA window start a multiple of 8 AND fully
    # in-bounds (edge values are masked by the vertical one-hot: yi <= h-2).
    planes_p = jnp.pad(
        planes, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge"
    )

    out = pl.pallas_call(
        _warp_kernel,
        grid=(nb, ncb),
        in_specs=[
            pl.BlockSpec((_B, _CB), lambda b, cb: (b, cb), memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, _CB), lambda b, cb: (b, cb), memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, _CB), lambda b, cb: (b, cb), memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, _CB), lambda b, cb: (b, cb), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (c, _B, _CB), lambda b, cb: (0, b, cb), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, k, cbh), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded(xi), padded(yi), padded(tx), padded(ty), planes_p)
    return out[:, :h, :w]


def warp_planes_banded(
    planes: jax.Array,
    flow: jax.Array,
    band: int = 64,
    window: int = 40,
    precision=None,
    m_form: str = "tent",
) -> jax.Array:
    """Banded bilinear warp — XLA scan formulation.

    ``m_form`` defaults to 'tent': one fused f32 chain instead of two
    compares + two selects, measured 15.77 vs 16.63 ms per 16-pair 540p
    call with max |d| = 6e-8 vs 'select' (scripts/exp_warp_m.py, r4).

    The fused Pallas kernel above compiles and matches, but measures SLOWER
    on v5e (4.7ms vs 3.4ms per 540p call): its per-output-row (1440,384)x
    (384,128) dots pipeline worse than XLA's batched einsum, its window DMA
    is not double-buffered, and Mosaic compiles take minutes per shape.  XLA
    wins until those change, so it is the only dispatch target; the kernel
    stays as the measured alternative (interpret-validated in tests).
    """
    return warp_planes_banded_xla(
        planes, flow, band=band, window=window, precision=precision, m_form=m_form
    )
