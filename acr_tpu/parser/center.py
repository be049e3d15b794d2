"""Center-heatmap decoding as fixed-shape jittable ops.

Equivalent of the reference CenterMap parser
(acr/result_parser.py:195-264): max-pool NMS (kernel 5), top-K peak
extraction, confidence threshold 0.35 — but with no data-dependent
shapes: every image always yields K candidate slots plus a validity
mask, so the whole decode stays inside the jitted program (the
reference's boolean indexing forces a host sync per frame,
result_parser.py:240-243).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def nms_heatmap(center_map: jnp.ndarray, kernel: int = 5) -> jnp.ndarray:
    """Keep only local maxima: x * (maxpool(x) == x).

    center_map: (B, H, W) or (B, H, W, 1). Matches torch MaxPool2d with
    stride 1 and symmetric padding (k-1)//2 (reference:
    acr/result_parser.py:245-249); padding value -inf never wins ties.
    """
    squeeze = center_map.ndim == 4
    x = center_map[..., 0] if squeeze else center_map
    pad = (kernel - 1) // 2
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)))
    out = jnp.where(pooled == x, x, 0.0)
    return out[..., None] if squeeze else out


class CenterDecode(NamedTuple):
    """Per-image top-K center candidates (fixed shapes)."""
    flat_inds: jnp.ndarray   # (B, K) int32 — index into flattened H*W
    yx: jnp.ndarray          # (B, K, 2) float32 — (row, col)
    scores: jnp.ndarray      # (B, K) float32
    valid: jnp.ndarray       # (B, K) bool — score > conf_thresh


def decode_centers(center_map: jnp.ndarray, k: int = 1,
                   conf_thresh: float = 0.35,
                   nms_kernel: int = 5) -> CenterDecode:
    """NMS + per-image top-K + confidence mask.

    center_map: (B, H, W, 1) raw heatmap. K=1 at inference, K=max_hand
    at training time (reference: acr/result_parser.py:221-224).
    """
    b, h, w = center_map.shape[:3]
    nmsed = nms_heatmap(center_map, nms_kernel)[..., 0].reshape(b, h * w)
    scores, inds = jax.lax.top_k(nmsed, k)
    ys = (inds // w).astype(jnp.float32)
    xs = (inds % w).astype(jnp.float32)
    return CenterDecode(
        flat_inds=inds.astype(jnp.int32),
        yx=jnp.stack([ys, xs], axis=-1),
        scores=scores,
        valid=scores > conf_thresh,
    )
