"""TPU compute kernels: residuals, fragments, optical flow, color transforms.

All ops are pure, batched, statically-shaped JAX functions designed to fuse
into one XLA program per frame-pair batch (no host round-trips between
stages, unlike the reference's PNG-file pipeline).
"""

from relaxtpu.ops.fragments import (
    absdiff,
    patch_scores,
    top_patch_indices,
    gather_fragment,
    fragment_pair,
    merge_fragments,
)
from relaxtpu.ops.colorspace import (
    bgr_to_gray,
    flow_to_bgr,
    hsv_to_bgr_u8,
    pack_i420,
    unpack_i420,
    yuv420_to_bgr,
)
from relaxtpu.ops.flow import farneback_flow
from relaxtpu.ops.warp import warp_planes_banded

__all__ = [
    "absdiff",
    "patch_scores",
    "top_patch_indices",
    "gather_fragment",
    "fragment_pair",
    "merge_fragments",
    "bgr_to_gray",
    "flow_to_bgr",
    "hsv_to_bgr_u8",
    "farneback_flow",
    "yuv420_to_bgr",
    "pack_i420",
    "unpack_i420",
    "warp_planes_banded",
]
