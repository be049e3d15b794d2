"""Ground-truth center-map rendering (training-side of CenterMap).

The reference CenterMap carries gaussian kernels for generating training
heatmaps alongside the NMS pools (reference: acr/result_parser.py:205-216,
kernel_sizes config.py:185, sigma=1). This renders the same maps as a
batched fixed-shape op, completing the CenterMap capability surface —
and with `decode_centers(k=max_hand)` it round-trips: render N centers,
decode N peaks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel(kernel_size: int, sigma: float = 1.0) -> np.ndarray:
    """(k, k) unnormalized gaussian, peak 1 at the center cell
    (reference: acr/result_parser.py:210-214)."""
    x = np.arange(kernel_size, dtype=np.float64)
    y = x[:, None]
    x0 = y0 = (kernel_size - 1) // 2
    return np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))


def render_center_maps(centers_yx: jnp.ndarray, valid: jnp.ndarray,
                       size: int = 64, sigma: float = 1.0) -> jnp.ndarray:
    """Render gaussian peaks at given centers.

    centers_yx: (B, N, 2) float map coords; valid: (B, N) bool ->
    (B, size, size, 1) heatmap, max-combined across instances.
    """
    ys = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    cy = centers_yx[..., 0][:, :, None, None]       # (B, N, 1, 1)
    cx = centers_yx[..., 1][:, :, None, None]
    d2 = (ys[None, None] - cy) ** 2 + (xs[None, None] - cx) ** 2
    g = jnp.exp(-d2 / (2.0 * sigma ** 2))
    g = jnp.where(valid[:, :, None, None], g, 0.0)
    return jnp.max(g, axis=1)[..., None]
