"""Pallas TPU rasterization kernel: single-pass z-buffer in VMEM.

The lax.scan rasterizer (viz/raster.py) materializes its per-chunk
(tile x width x faces) intermediates through HBM on every scan step —
measured ~260 ms/frame at 512px on a v5e. This kernel keeps the
z-buffer, winning-face indices, and barycentrics resident in VMEM for
a whole row-tile and streams face chunks through registers, so the
pixel/face sweep is VPU-bound instead of HBM-bound.

Layout: faces live on the LANE axis (padded to a 128 multiple); the
grid walks row-tiles of 8 rows; each program folds over face chunks
with a fori_loop carrying the (8, W) buffers.

Outputs match viz/raster.rasterize exactly: (face_id, bary) per pixel,
-1 = background.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8
FACE_CHUNK = 128      # lane-slice alignment: dynamic slices must be 128-aligned


COL_TILE = 256        # width tile: keeps (8, 256, 128) intermediates in VMEM

BIN_CAP = 512         # default per-tile face capacity for the binned kernel

BAND_H = 256          # banded kernel: row-band height (px)
BAND_CAP = 2048       # banded kernel: per-band face-table capacity


def bin_cap_for(size: int) -> int:
    """Largest per-tile face capacity tier available at this render
    size — BIN_CAP at every size. This used to halve above 1024px on
    the assumption that high-res tiles intersect a smaller slice of
    the mesh, but that is empirically false for close-ups: the bench
    realistic two-hand scene measures max 377 bbox-overlap faces/tile
    at 512, 1024 AND 2048 px (face bboxes grow with resolution as fast
    as the per-tile mesh slice shrinks), so the halved cap pushed
    every 2048px frame off the binned tiers onto the ~277 ms flat
    fallback (measured: fused 2048px stream step 331.8 -> 68.4 ms p50,
    together with the dynamic per-tile chunk bound and the iota
    slot-live mask below). The ADAPTIVE tier switch in render_hands already picks
    the smallest sufficient capacity per frame, so sparse high-res
    frames still ride tier 128/256; shrinking the tier LIST only
    removed the exact middle ground between tier 256 and the flat
    kernel. Per-tile kernel shapes are size-independent ((16, cap)
    face rows, (8, col_tile) buffers), so cap 512 is VMEM-safe at any
    resolution."""
    del size
    return BIN_CAP


N_ATTR = 16           # per-face attribute rows picked in-kernel (see below)


def _attr_pick_fold(slot, attr_rows, n_chunks, col_tile):
    """Winner-attribute pick on the MXU, AFTER the z-fold.

    ``slot`` (8, col_tile) int32: the winning face's index into
    ``attr_rows`` (N_ATTR, n_chunks*FACE_CHUNK) per pixel (-1 =
    background). Folds over face chunks accumulating
    one-hot(slot) @ attr_chunk -> (px, N_ATTR); each pixel's slot lies
    in exactly one chunk, so the sum accumulates the single hit.

    Exact: each one-hot row has at most a single 1.0, and 1.0 x a
    accumulates to precisely ``a`` under Precision.HIGHEST (the bf16x3
    f32 decomposition reconstructs a 24-bit mantissa, and adding it to
    an all-zero f32 accumulator is exact) — so this is bit-identical
    to a per-pixel gather, at matmul speed instead of gather speed
    (the (H, W) attribute gather this replaces profiled at 3.1
    ms/frame at 512px; the matmul rides the otherwise-idle MXU).
    Running it after the z-fold keeps it out of the edge-math loop's
    VMEM live set.
    """
    px_flat = ROW_TILE * col_tile
    # one sublane->lane relayout per tile; everything downstream is a
    # standard (N_ATTR, 128) @ (128, px) matmul with no transposes.
    # The result stays (N_ATTR, px) so the VMEM/HBM lane dimension is
    # px (a (px, 16) layout would pad 16 lanes -> 128 and double-buffer
    # the waste).
    slot_row = slot.reshape(1, px_flat)
    sub = jax.lax.broadcasted_iota(jnp.int32, (FACE_CHUNK, px_flat), 0)

    def step(ci, attrc):
        sl = pl.multiple_of(ci * FACE_CHUNK, FACE_CHUNK)
        attr_chunk = attr_rows(sl)                    # (N_ATTR, 128)
        onehot_t = (sub == slot_row - sl).astype(jnp.float32)
        return attrc + jax.lax.dot_general(
            attr_chunk, onehot_t, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)      # (N_ATTR, px)

    init = jnp.zeros((N_ATTR, px_flat), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, step, init)


def _raster_kernel(tri_ref, inv_ref, *rest, n_chunks: int, col_tile: int,
                   with_attrs: bool):
    """One (row, column) tile: fold face chunks, carry buffers functionally.

    tri_ref: (16, F_pad) — rows 0..8 = [ax, ay, az, bx, by, bz, cx, cy,
             cz], rows 9..15 zero sublane padding.
    inv_ref: (1, F_pad) inverse signed area (0 for degenerate faces).
    with_attrs adds attr_ref (N_ATTR, F_pad) per-face attribute rows and
    an (px, N_ATTR) output of the winning face's rows per pixel
    (background keeps zeros).
    """
    if with_attrs:
        attr_ref, fid_ref, b0_ref, b1_ref, attr_out_ref = rest
    else:
        attr_ref = attr_out_ref = None
        fid_ref, b0_ref, b1_ref = rest
    tile_r = pl.program_id(0)
    tile_c = pl.program_id(1)
    # tpu.iota only produces integers; cast to f32 afterwards
    px = (jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, col_tile), 1).astype(jnp.float32)
        + tile_c * col_tile + 0.5)
    py = (jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, col_tile), 0).astype(jnp.float32)
        + tile_r * ROW_TILE + 0.5)
    width = col_tile

    def chunk_step(ci, carry):
        zbuf, fid, b0c, b1c = carry
        sl = pl.multiple_of(ci * FACE_CHUNK, FACE_CHUNK)
        ax = tri_ref[0, pl.ds(sl, FACE_CHUNK)]
        ay = tri_ref[1, pl.ds(sl, FACE_CHUNK)]
        az = tri_ref[2, pl.ds(sl, FACE_CHUNK)]
        bx = tri_ref[3, pl.ds(sl, FACE_CHUNK)]
        by = tri_ref[4, pl.ds(sl, FACE_CHUNK)]
        bz = tri_ref[5, pl.ds(sl, FACE_CHUNK)]
        cx = tri_ref[6, pl.ds(sl, FACE_CHUNK)]
        cy = tri_ref[7, pl.ds(sl, FACE_CHUNK)]
        cz = tri_ref[8, pl.ds(sl, FACE_CHUNK)]
        inv = inv_ref[0, pl.ds(sl, FACE_CHUNK)]

        gx = px[:, :, None]
        gy = py[:, :, None]
        # barycentric edge functions (same math as viz/raster.py)
        w0 = ((cx - bx)[None, None, :] * (gy - by[None, None, :])
              - (cy - by)[None, None, :] * (gx - bx[None, None, :])) \
            * inv[None, None, :]
        w1 = ((ax - cx)[None, None, :] * (gy - cy[None, None, :])
              - (ay - cy)[None, None, :] * (gx - cx[None, None, :])) \
            * inv[None, None, :]
        w2 = 1.0 - w0 - w1
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (inv != 0.0)[None, None, :])
        depth = (w0 * az[None, None, :] + w1 * bz[None, None, :]
                 + w2 * cz[None, None, :])
        depth = jnp.where(inside, depth, jnp.inf)

        # winner within the chunk via min-reduction + one-hot select
        # (Mosaic supports reductions but not 3D gathers)
        best = jnp.argmin(depth, axis=-1)                     # (8, W)
        lane = jax.lax.broadcasted_iota(jnp.int32,
                                        (ROW_TILE, width, FACE_CHUNK), 2)
        onehot = (lane == best[..., None]).astype(jnp.float32)
        best_z = jnp.min(depth, axis=-1)
        pick = lambda w: jnp.sum(jnp.where(onehot > 0, w, 0.0), axis=-1)
        win = best_z < zbuf
        zbuf = jnp.where(win, best_z, zbuf)
        fid = jnp.where(win, sl + best.astype(jnp.int32), fid)
        b0c = jnp.where(win, pick(w0), b0c)
        b1c = jnp.where(win, pick(w1), b1c)
        return zbuf, fid, b0c, b1c

    init = (jnp.full((ROW_TILE, col_tile), jnp.inf, jnp.float32),
            jnp.full((ROW_TILE, col_tile), -1, jnp.int32),
            jnp.zeros((ROW_TILE, col_tile), jnp.float32),
            jnp.zeros((ROW_TILE, col_tile), jnp.float32))
    _, fid, b0c, b1c = jax.lax.fori_loop(0, n_chunks, chunk_step, init)
    fid_ref[:] = fid
    b0_ref[:] = b0c
    b1_ref[:] = b1c
    if with_attrs:
        # flat kernel: the winning global face id IS the attr column
        attr_out_ref[0] = _attr_pick_fold(
            fid, lambda sl: attr_ref[:, pl.ds(sl, FACE_CHUNK)],
            n_chunks, col_tile)


def _raster_kernel_binned(nc_ref, tri_ref, inv_ref, ids_ref, *rest,
                          n_chunks: int, col_tile: int, with_attrs: bool):
    """Like _raster_kernel, but over THIS tile's binned face list.

    nc_ref:  (T,) int32 scalar-prefetch ref (SMEM, whole array; this
             toolchain's mosaic rejects blocked SMEM scalars) — how
             many face CHUNKS each tile actually holds
             (ceil(live count / FACE_CHUNK)). The fold runs only this
             tile's count (dynamic fori_loop bound): the capacity is a
             worst-case guarantee, and sweeping it everywhere made one
             dense tile tax every empty tile of the frame — at 2048px
             that was 8192 chunk sweeps for a scene needing ~700.
             Bit-identical to the full sweep: the skipped slots all
             have inv == 0, which can never win.
    tri_ref: (1, R, CAP) gathered triangle rows for the tile — R = 16
             (rows 0..8 = triangle, rest pad) or 32 when with_attrs
             (rows 16..31 = per-face attribute rows, see _attr_pick);
    inv_ref: (1, 1, CAP) inverse areas (0 for empty/degenerate slots);
    ids_ref: (1, 1, CAP) int32 global face ids (-1 for empty slots).
    """
    if with_attrs:
        fid_ref, b0_ref, b1_ref, attr_out_ref = rest
    else:
        fid_ref, b0_ref, b1_ref = rest
    tile_r = pl.program_id(0)
    tile_c = pl.program_id(1)
    px = (jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, col_tile), 1).astype(jnp.float32)
        + tile_c * col_tile + 0.5)
    py = (jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, col_tile), 0).astype(jnp.float32)
        + tile_r * ROW_TILE + 0.5)
    width = col_tile

    def chunk_step(ci, carry):
        if with_attrs:
            zbuf, fid, b0c, b1c, slotc = carry
        else:
            (zbuf, fid, b0c, b1c), slotc = carry, None
        sl = pl.multiple_of(ci * FACE_CHUNK, FACE_CHUNK)
        ax = tri_ref[0, 0, pl.ds(sl, FACE_CHUNK)]
        ay = tri_ref[0, 1, pl.ds(sl, FACE_CHUNK)]
        az = tri_ref[0, 2, pl.ds(sl, FACE_CHUNK)]
        bx = tri_ref[0, 3, pl.ds(sl, FACE_CHUNK)]
        by = tri_ref[0, 4, pl.ds(sl, FACE_CHUNK)]
        bz = tri_ref[0, 5, pl.ds(sl, FACE_CHUNK)]
        cx = tri_ref[0, 6, pl.ds(sl, FACE_CHUNK)]
        cy = tri_ref[0, 7, pl.ds(sl, FACE_CHUNK)]
        cz = tri_ref[0, 8, pl.ds(sl, FACE_CHUNK)]
        inv = inv_ref[0, 0, pl.ds(sl, FACE_CHUNK)]
        gids = ids_ref[0, 0, pl.ds(sl, FACE_CHUNK)]

        gx = px[:, :, None]
        gy = py[:, :, None]
        w0 = ((cx - bx)[None, None, :] * (gy - by[None, None, :])
              - (cy - by)[None, None, :] * (gx - bx[None, None, :])) \
            * inv[None, None, :]
        w1 = ((ax - cx)[None, None, :] * (gy - cy[None, None, :])
              - (ay - cy)[None, None, :] * (gx - cx[None, None, :])) \
            * inv[None, None, :]
        w2 = 1.0 - w0 - w1
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (inv != 0.0)[None, None, :])
        depth = (w0 * az[None, None, :] + w1 * bz[None, None, :]
                 + w2 * cz[None, None, :])
        depth = jnp.where(inside, depth, jnp.inf)

        best = jnp.argmin(depth, axis=-1)                     # (8, W)
        lane = jax.lax.broadcasted_iota(jnp.int32,
                                        (ROW_TILE, width, FACE_CHUNK), 2)
        onehot = lane == best[..., None]
        best_z = jnp.min(depth, axis=-1)
        pickf = lambda w: jnp.sum(jnp.where(onehot, w, 0.0), axis=-1)
        picki = jnp.sum(jnp.where(onehot, gids[None, None, :], 0), axis=-1)
        win = best_z < zbuf
        zbuf = jnp.where(win, best_z, zbuf)
        fid = jnp.where(win, picki, fid)
        b0c = jnp.where(win, pickf(w0), b0c)
        b1c = jnp.where(win, pickf(w1), b1c)
        if not with_attrs:
            return zbuf, fid, b0c, b1c
        # the winner's CAP-SLOT index keys the post-fold attr pick
        # (fid holds the global id, useless against this tile's list)
        slotc = jnp.where(win, sl + best.astype(jnp.int32), slotc)
        return zbuf, fid, b0c, b1c, slotc

    init = (jnp.full((ROW_TILE, col_tile), jnp.inf, jnp.float32),
            jnp.full((ROW_TILE, col_tile), -1, jnp.int32),
            jnp.zeros((ROW_TILE, col_tile), jnp.float32),
            jnp.zeros((ROW_TILE, col_tile), jnp.float32))
    if with_attrs:
        init = init + (jnp.full((ROW_TILE, col_tile), -1, jnp.int32),)
    n_tx_grid = pl.num_programs(1)
    nc = jnp.minimum(nc_ref[tile_r * n_tx_grid + tile_c],
                     n_chunks)                  # dynamic per-tile bound
    out = jax.lax.fori_loop(0, nc, chunk_step, init)
    fid_ref[:] = out[1]
    b0_ref[:] = out[2]
    b1_ref[:] = out[3]
    if with_attrs:
        attr_out_ref[0] = _attr_pick_fold(
            out[4], lambda sl: tri_ref[0, 16:, pl.ds(sl, FACE_CHUNK)],
            nc, col_tile)


def _raster_kernel_banded(tilenc_ref, fetchnc_ref, table_ref, ids_ref,
                          *rest, n_chunks: int, band_chunks: int,
                          col_tile: int, with_attrs: bool):
    """Two-level (banded) variant: per-ROW-BAND face tables + per-tile
    SLOT-ID lists; face rows are fetched in-kernel from the band table.

    The cap-512 binned kernel's cost at high resolution is not the
    pixel/face sweep — it is the PRESTAGE gather materializing
    (T, 32, cap) face rows through HBM (10.3 ms of the 40.5 ms 2048px
    fused step, plus 3.3 ms relayout; tools/profile_stream.py). Here
    the prestage gathers face DATA only per band (n_bands tables of
    (R, band_cap) — ~2 MB instead of 134 MB) and per tile only int32
    slot indices into the band table (4 B/slot instead of 128 B). The
    kernel reconstructs each chunk's face rows with the exact one-hot
    MXU contraction (same argument as _attr_pick_fold: one-hot x value
    under Precision.HIGHEST accumulates bit-exactly).

    Why this does NOT re-introduce the O(F) sweep that killed the
    earlier ids-only experiment (measured 40.5 -> 59.8 ms and
    reverted, docs/PERFORMANCE.md): that fetch contracted over the
    FULL padded face table (K = F_pad = 3200) for every 128-id chunk.
    Here the contraction is (a) over the band table (K = band_cap)
    and (b) dynamically bounded per tile by ``fetchnc_ref`` — the
    chunk count covering this tile's HIGHEST band slot (slot lists
    are ascending, so that bound is exact) — i.e. the fetch cost
    scales with the band's LIVE face count, not with F.

    tilenc_ref:  (T,) int32 scalar-prefetch — per-tile live chunk
                 count for the z-fold bound (as in the binned kernel).
    fetchnc_ref: (T,) int32 scalar-prefetch — per-tile BAND-chunk
                 bound for the fetch and attr folds.
    table_ref:   (1, R, band_cap) this tile's band table; rows 0..8 =
                 triangle, 9 = inverse area, 10 = global face id (f32,
                 exact for ids < 2^24), 11..15 pad, 16..31 = attribute
                 rows when with_attrs.
    ids_ref:     (1, 1, cap) int32 band-slot indices, ascending;
                 dead slots hold band_cap (matches no one-hot lane).
    """
    if with_attrs:
        fid_ref, b0_ref, b1_ref, attr_out_ref = rest
    else:
        fid_ref, b0_ref, b1_ref = rest
    tile_r = pl.program_id(0)
    tile_c = pl.program_id(1)
    px = (jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, col_tile), 1).astype(jnp.float32)
        + tile_c * col_tile + 0.5)
    py = (jax.lax.broadcasted_iota(
        jnp.int32, (ROW_TILE, col_tile), 0).astype(jnp.float32)
        + tile_r * ROW_TILE + 0.5)
    width = col_tile
    t = tile_r * pl.num_programs(1) + tile_c
    nc = jnp.minimum(tilenc_ref[t], n_chunks)
    fnc = jnp.minimum(fetchnc_ref[t], band_chunks)

    def chunk_step(ci, carry):
        if with_attrs:
            zbuf, fid, b0c, b1c, slotc = carry
        else:
            (zbuf, fid, b0c, b1c), slotc = carry, None
        sl = pl.multiple_of(ci * FACE_CHUNK, FACE_CHUNK)
        slots = ids_ref[0, 0, pl.ds(sl, FACE_CHUNK)]          # (128,)
        slot_row = slots[None, :]

        def fetch_step(bc, acc):
            bsl = pl.multiple_of(bc * FACE_CHUNK, FACE_CHUNK)
            sub = jax.lax.broadcasted_iota(
                jnp.int32, (FACE_CHUNK, FACE_CHUNK), 0)
            onehot = (sub == slot_row - bsl).astype(jnp.float32)
            rows = table_ref[0, :16, pl.ds(bsl, FACE_CHUNK)]  # (16, 128)
            return acc + jax.lax.dot_general(
                rows, onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        fetched = jax.lax.fori_loop(
            0, fnc, fetch_step, jnp.zeros((16, FACE_CHUNK), jnp.float32))
        ax, ay, az = fetched[0], fetched[1], fetched[2]
        bx, by, bz = fetched[3], fetched[4], fetched[5]
        cx, cy, cz = fetched[6], fetched[7], fetched[8]
        inv = fetched[9]
        gids = fetched[10].astype(jnp.int32)   # exact: ids < 2^24
        # dead slots (sentinel band_cap) fetch all-zero columns ->
        # inv == 0 -> inside False -> depth inf -> can never win

        gx = px[:, :, None]
        gy = py[:, :, None]
        w0 = ((cx - bx)[None, None, :] * (gy - by[None, None, :])
              - (cy - by)[None, None, :] * (gx - bx[None, None, :])) \
            * inv[None, None, :]
        w1 = ((ax - cx)[None, None, :] * (gy - cy[None, None, :])
              - (ay - cy)[None, None, :] * (gx - cx[None, None, :])) \
            * inv[None, None, :]
        w2 = 1.0 - w0 - w1
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (inv != 0.0)[None, None, :])
        depth = (w0 * az[None, None, :] + w1 * bz[None, None, :]
                 + w2 * cz[None, None, :])
        depth = jnp.where(inside, depth, jnp.inf)

        best = jnp.argmin(depth, axis=-1)                     # (8, W)
        lane = jax.lax.broadcasted_iota(jnp.int32,
                                        (ROW_TILE, width, FACE_CHUNK), 2)
        onehot = lane == best[..., None]
        best_z = jnp.min(depth, axis=-1)
        pickf = lambda w: jnp.sum(jnp.where(onehot, w, 0.0), axis=-1)
        picki = lambda v: jnp.sum(
            jnp.where(onehot, v[None, None, :], 0), axis=-1)
        win = best_z < zbuf
        zbuf = jnp.where(win, best_z, zbuf)
        fid = jnp.where(win, picki(gids), fid)
        b0c = jnp.where(win, pickf(w0), b0c)
        b1c = jnp.where(win, pickf(w1), b1c)
        if not with_attrs:
            return zbuf, fid, b0c, b1c
        # the winner's BAND slot keys the post-fold attr pick
        slotc = jnp.where(win, picki(slots), slotc)
        return zbuf, fid, b0c, b1c, slotc

    init = (jnp.full((ROW_TILE, col_tile), jnp.inf, jnp.float32),
            jnp.full((ROW_TILE, col_tile), -1, jnp.int32),
            jnp.zeros((ROW_TILE, col_tile), jnp.float32),
            jnp.zeros((ROW_TILE, col_tile), jnp.float32))
    if with_attrs:
        init = init + (jnp.full((ROW_TILE, col_tile), -1, jnp.int32),)
    out = jax.lax.fori_loop(0, nc, chunk_step, init)
    fid_ref[:] = out[1]
    b0_ref[:] = out[2]
    b1_ref[:] = out[3]
    if with_attrs:
        picked = _attr_pick_fold(
            out[4], lambda sl: table_ref[0, 16:, pl.ds(sl, FACE_CHUNK)],
            fnc, col_tile)                          # (N_ATTR, px)
        # write PLANAR (N_ATTR, ROW_TILE, col_tile) blocks straight
        # into the (N_ATTR, H, W) output — no post-kernel relayout
        # (the tile-major contract's _attr_planes transpose moved
        # ~268 MB at 2048px, 3.3 ms/frame in the r4 profile). Eight
        # static lane-aligned slices, one per pixel row.
        for r in range(ROW_TILE):
            attr_out_ref[:, r, :] = picked[:, r * col_tile:
                                           (r + 1) * col_tile]


def _bin_faces_banded(full_rows: jnp.ndarray, xmin, xmax, ymin, ymax,
                      live, height: int, width: int, col_tile: int,
                      band_h: int, band_cap: int, cap: int):
    """Two-level binning prestage for _raster_kernel_banded.

    full_rows (R, F) per-face rows (geometry + inv + gid [+ attrs]);
    xmin/xmax/ymin/ymax/live (F,) face bboxes and liveness.

    Level 1: faces -> horizontal ROW BANDS of ``band_h`` px by y-bbox
    overlap; gather each band's compact face table (n_bands, R,
    band_cap) — the ONLY face-data gather, ~2 MB at 2048px vs the
    single-level prestage's 134 MB (T, 32, cap) gather.
    Level 2: within each band, faces -> (8 x col_tile) tiles by bbox
    overlap against the BAND's bboxes; per tile only the int32 slot
    indices into the band table are kept (ascending = band order =
    global face-id order, so winner ties stay bit-identical), dead
    slots hold the sentinel ``band_cap``.

    Returns (table, ids_t, tilenc, fetchnc): the band tables, the
    (T, 1, cap) slot lists, the per-tile live CHUNK counts bounding
    the z-fold, and the per-tile BAND-chunk counts bounding the
    fetch/attr folds (ceil((highest slot + 1) / FACE_CHUNK), exact
    because slot lists are ascending).

    Overflow contract mirrors _bin_faces: a band (tile) whose overlap
    count exceeds band_cap (cap) drops the highest-id faces — callers
    gate on banded_overflow_stats and fall back to the flat kernel.
    """
    n_bands = height // band_h
    tpb_y = band_h // ROW_TILE
    n_tx = width // col_tile
    by = jnp.arange(n_bands, dtype=jnp.float32) * band_h
    band_hit = ((ymin[None, :] <= by[:, None] + band_h)
                & (ymax[None, :] >= by[:, None])
                & live[None, :])                         # (nb, F)
    border = jnp.argsort(~band_hit, axis=1,
                         stable=True)[:, :band_cap]      # (nb, band_cap)
    bcounts = jnp.minimum(band_hit.sum(axis=1),
                          band_cap).astype(jnp.int32)
    bslot_live = (jnp.arange(band_cap, dtype=jnp.int32)[None, :]
                  < bcounts[:, None])                    # (nb, band_cap)

    table = full_rows.T[border].transpose(0, 2, 1)       # (nb, R, band_cap)
    # dead band slots: inverse area -> 0 (can never win), gid -> -1
    table = table.at[:, 9, :].multiply(bslot_live)
    table = table.at[:, 10, :].set(
        jnp.where(bslot_live, table[:, 10, :], -1.0))

    # level 2 against the BAND's bboxes (small gathers: 4 floats/slot)
    xmin_b, xmax_b = xmin[border], xmax[border]          # (nb, band_cap)
    ymin_b, ymax_b = ymin[border], ymax[border]
    ty = (by[:, None]
          + jnp.arange(tpb_y, dtype=jnp.float32)[None, :] * ROW_TILE)
    y_hit = ((ymin_b[:, None, :] <= ty[..., None] + ROW_TILE)
             & (ymax_b[:, None, :] >= ty[..., None]))    # (nb, ty, cap)
    tx = jnp.arange(n_tx, dtype=jnp.float32) * col_tile
    x_hit = ((xmin_b[:, None, :] <= tx[None, :, None] + col_tile)
             & (xmax_b[:, None, :] >= tx[None, :, None]))  # (nb, tx, cap)
    ov = (y_hit[:, :, None, :] & x_hit[:, None, :, :]
          & bslot_live[:, None, None, :])
    ov = ov.reshape(n_bands * tpb_y * n_tx, band_cap)    # (T, band_cap)

    # single-operand int32 key sort: the KEY IS the slot id (live
    # slots keep their id, dead ones take the sentinel band_cap), so
    # one sorted operand yields the ascending slot list, the overflow
    # truncation (lowest cap ids survive = highest-id faces drop,
    # same contract as the argsort it replaces) and the dead-slot
    # sentinel in one pass. The bool-key argsort + index payload this
    # replaces was the prestage's hottest op pair at 2048px
    # (sort + shift-left fusion, ~3.7 ms/frame in the r5 profile).
    keys = jnp.where(ov, jnp.arange(band_cap, dtype=jnp.int32)[None, :],
                     band_cap)                           # (T, band_cap)
    ids_t = jax.lax.sort(keys, dimension=1)[:, :cap]     # ascending
    counts_t = jnp.minimum(ov.sum(axis=1), cap).astype(jnp.int32)
    tilenc = (counts_t + FACE_CHUNK - 1) // FACE_CHUNK
    # highest live slot per tile (ascending order) -> exact fetch bound
    max_slot = jnp.take_along_axis(
        ids_t, jnp.maximum(counts_t - 1, 0)[:, None], axis=1)[:, 0]
    fetchnc = jnp.where(counts_t > 0, max_slot // FACE_CHUNK + 1, 0)
    return table, ids_t[:, None, :], tilenc, fetchnc


@functools.partial(jax.jit, static_argnames=("height", "width", "col_tile",
                                             "band_h"))
def banded_overflow_stats(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                          height: int, width: int,
                          col_tile: int = COL_TILE, band_h: int = BAND_H):
    """(max faces per tile, max faces per band) for the banded kernel's
    two fixed capacities — same bbox-overlap counts the prestage
    computes, no kernel run. Callers gate the banded branch on both."""
    f_total = faces.shape[0]
    tri = verts_screen[faces]
    xs, ys = tri[:, :, 0], tri[:, :, 1]
    xmin, xmax = xs.min(1), xs.max(1)
    ymin, ymax = ys.min(1), ys.max(1)
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    live = jnp.abs(area) >= 1e-9
    ct = min(col_tile, width)
    ty = jnp.arange(height // ROW_TILE, dtype=jnp.float32) * ROW_TILE
    tx = jnp.arange(width // ct, dtype=jnp.float32) * ct
    y_hit = (ymin[None] <= ty[:, None] + ROW_TILE) & (ymax[None] >= ty[:, None])
    x_hit = (xmin[None] <= tx[:, None] + ct) & (xmax[None] >= tx[:, None])
    t_counts = jnp.sum(
        (y_hit[:, None, :] & x_hit[None, :, :] & live[None, None, :]),
        axis=-1).reshape(-1)
    by = jnp.arange(height // band_h, dtype=jnp.float32) * band_h
    b_hit = ((ymin[None] <= by[:, None] + band_h)
             & (ymax[None] >= by[:, None]) & live[None])
    return t_counts.max(), b_hit.sum(axis=1).max()


@functools.partial(jax.jit, static_argnames=("height", "width", "band_cap",
                                             "bin_cap", "band_h",
                                             "interpret"))
def rasterize_pallas_banded(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                            height: int, width: int, band_cap: int = BAND_CAP,
                            bin_cap: int = BIN_CAP, band_h: int = BAND_H,
                            interpret: bool = False, attrs=None):
    """Two-level binned rasterizer: same output contract as
    rasterize_pallas_binned, built for HIGH resolutions where the
    single-level prestage's (T, 32, cap) face-row gather dominates
    (measured 10.3 ms gather + 3.3 ms relayout of the 40.5 ms 2048px
    fused step). Faces are gathered once per ROW BAND; tiles carry
    only slot indices; the kernel fetches rows via the exact one-hot
    MXU contraction, dynamically bounded by each tile's highest band
    slot (see _raster_kernel_banded).

    Bit-identical to rasterize_pallas while no tile exceeds
    ``bin_cap`` AND no band exceeds ``band_cap`` (gate on
    banded_overflow_stats); beyond either capacity the highest-id
    faces are dropped, mirroring the single-level overflow contract.
    """
    f_total = faces.shape[0]
    assert f_total % FACE_CHUNK == 0
    assert bin_cap % FACE_CHUNK == 0 and band_cap % FACE_CHUNK == 0
    assert height % band_h == 0 and band_h % ROW_TILE == 0
    band_cap = min(band_cap, f_total)
    bin_cap = min(bin_cap, band_cap)
    col_tile = min(COL_TILE, width)
    assert width % col_tile == 0
    n_ty, n_tx = height // ROW_TILE, width // col_tile
    n_chunks = bin_cap // FACE_CHUNK
    band_chunks = band_cap // FACE_CHUNK
    with_attrs = attrs is not None

    tri = verts_screen[faces]                        # (F, 3, 3)
    tri_rows = tri.transpose(1, 2, 0).reshape(9, f_total)
    xs, ys = tri[:, :, 0], tri[:, :, 1]
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)
    gid = jnp.arange(f_total, dtype=jnp.float32)     # exact < 2^24
    pad5 = jnp.zeros((5, f_total), tri_rows.dtype)
    parts = [tri_rows, inv_area[None], gid[None], pad5]
    if with_attrs:
        parts.append(attrs.astype(tri_rows.dtype))
    full_rows = jnp.concatenate(parts, axis=0)       # (16 or 32, F)

    table, ids_t, tilenc, fetchnc = _bin_faces_banded(
        full_rows, xs.min(1), xs.max(1), ys.min(1), ys.max(1),
        inv_area != 0.0, height, width, col_tile, band_h, band_cap,
        bin_cap)

    kernel = functools.partial(
        _raster_kernel_banded, n_chunks=n_chunks, band_chunks=band_chunks,
        col_tile=col_tile, with_attrs=with_attrs)
    grid = (n_ty, n_tx)
    tpb_y = band_h // ROW_TILE
    out_spec = pl.BlockSpec((ROW_TILE, col_tile),
                            lambda i, j, nc, fc: (i, j),
                            memory_space=pltpu.VMEM)
    tile_ix = lambda i, j, nc, fc: (i * n_tx + j, 0, 0)
    band_ix = lambda i, j, nc, fc: (i // tpb_y, 0, 0)
    out_specs = [out_spec, out_spec, out_spec]
    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
    ]
    if with_attrs:
        # planar blocks written in-kernel: the (N_ATTR, H, W) output
        # needs no _attr_planes relayout (3.3 ms/frame at 2048px)
        out_specs.append(pl.BlockSpec(
            (N_ATTR, ROW_TILE, col_tile), lambda i, j, nc, fc: (0, i, j),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (N_ATTR, height, width), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, full_rows.shape[0], band_cap), band_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bin_cap), tile_ix,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(tilenc, fetchnc, table, ids_t)
    fid, b0, b1 = outs[:3]
    if with_attrs:
        mask = fid >= 0
        bary = tuple(jnp.where(mask, b, 0.0)
                     for b in (b0, b1, 1.0 - b0 - b1))
        return fid, bary, outs[3]
    bary = jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)
    bary = jnp.where((fid >= 0)[..., None], bary, 0.0)
    return fid, bary


def _bin_faces(tri_rows: jnp.ndarray, inv_area: jnp.ndarray,
               height: int, width: int, col_tile: int, cap: int):
    """Bin faces into fixed-capacity per-tile lists by bbox overlap.

    tri_rows (16, F), inv_area (1, F) -> gathered
    (T, 16, cap) triangle rows, (T, 1, cap) inverse areas,
    (T, 1, cap) int32 global ids; T = (H/8) * (W/col_tile) tiles in
    row-major grid order.

    Faces are kept in FACE-ID order within each tile (stable sort), so
    while every tile stays under capacity the winner selection —
    including shared-edge depth ties — is bit-identical to the
    unbinned kernel. A tile whose overlap count exceeds ``cap`` drops
    the highest-id faces (MANO hand meshes peak at a few hundred faces
    per 8x256px band, far below the default 512).

    Also returns the per-tile live counts (T,) int32 (clipped to
    ``cap``) so the kernel can bound its chunk fold by THIS tile's
    actual fill instead of sweeping the full capacity everywhere —
    the capacity is a worst-case guarantee, but most tiles of a real
    frame are empty or near-empty (a 2048px close-up has 12 tiles
    above 256 faces and ~1400 with zero).
    """
    f_total = tri_rows.shape[1]
    n_ty = height // ROW_TILE
    n_tx = width // col_tile
    xs = tri_rows[jnp.array([0, 3, 6])]           # (3, F)
    ys = tri_rows[jnp.array([1, 4, 7])]
    xmin, xmax = xs.min(0), xs.max(0)
    ymin, ymax = ys.min(0), ys.max(0)

    ty = jnp.arange(n_ty, dtype=jnp.float32) * ROW_TILE
    tx = jnp.arange(n_tx, dtype=jnp.float32) * col_tile
    # pixel centers in a tile span [t0 + 0.5, t0 + tile - 0.5]
    y_hit = ((ymin[None, :] <= ty[:, None] + ROW_TILE)
             & (ymax[None, :] >= ty[:, None]))              # (Ty, F)
    x_hit = ((xmin[None, :] <= tx[:, None] + col_tile)
             & (xmax[None, :] >= tx[:, None]))              # (Tx, F)
    live = (inv_area[0] != 0.0)
    overlap = (y_hit[:, None, :] & x_hit[None, :, :]
               & live[None, None, :]).reshape(n_ty * n_tx, f_total)

    # stable argsort: overlapping faces first, original id order kept
    order = jnp.argsort(~overlap, axis=1, stable=True)[:, :cap]  # (T, cap)
    counts = jnp.minimum(overlap.sum(axis=1), cap).astype(jnp.int32)
    # live-first stable order means slot k is live iff k < count — a
    # free iota compare; the take_along_axis(overlap, order) gather it
    # replaces profiled at 11.0 ms/frame at 2048px (31% of the render)
    slot_live = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                 < counts[:, None])                             # (T, cap)

    tri_t = tri_rows.T[order]                    # (T, cap, 16)
    tri_t = tri_t.transpose(0, 2, 1)             # (T, 16, cap)
    inv_t = inv_area[0][order] * slot_live       # empty slots -> 0
    ids_t = jnp.where(slot_live, order.astype(jnp.int32), -1)
    return tri_t, inv_t[:, None, :], ids_t[:, None, :], counts


@functools.partial(jax.jit, static_argnames=("height", "width", "col_tile",
                                             "cap"))
def bin_overflow_stats(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                       height: int, width: int,
                       col_tile: int = COL_TILE, cap: int = BIN_CAP):
    """Observability for the binned kernel's fixed capacity.

    Returns (max_faces_per_tile, n_overflowing_tiles) as device scalars
    — cheap (the same bbox-overlap matrix the prestage builds, no
    kernel run), so production can sample it to confirm ``cap`` holds
    for its mesh/zoom regime instead of trusting the default silently.
    """
    f_total = faces.shape[0]
    tri = verts_screen[faces]
    xs, ys = tri[:, :, 0], tri[:, :, 1]
    xmin, xmax = xs.min(1), xs.max(1)
    ymin, ymax = ys.min(1), ys.max(1)
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    live = jnp.abs(area) >= 1e-9
    ct = min(col_tile, width)
    ty = jnp.arange(height // ROW_TILE, dtype=jnp.float32) * ROW_TILE
    tx = jnp.arange(width // ct, dtype=jnp.float32) * ct
    y_hit = (ymin[None] <= ty[:, None] + ROW_TILE) & (ymax[None] >= ty[:, None])
    x_hit = (xmin[None] <= tx[:, None] + ct) & (xmax[None] >= tx[:, None])
    counts = jnp.sum(
        (y_hit[:, None, :] & x_hit[None, :, :] & live[None, None, :]),
        axis=-1).reshape(-1)
    return counts.max(), jnp.sum(counts > cap)


@functools.partial(jax.jit, static_argnames=("height", "band_h",
                                             "band_cap"))
def band_overflow_stats(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                        height: int, band_h: int = BAND_H,
                        band_cap: int = BAND_CAP):
    """Observability for the BANDED kernel's per-band table capacity.

    Returns (max_faces_per_band, n_overflowing_bands) as device
    scalars — the level-1 analogue of bin_overflow_stats. A band above
    ``band_cap`` makes render_hands' high-res path take the flat
    fallback for the WHOLE frame even when every tile is under the
    tile cap, so production probes must watch this count too (the
    tile-only probe is blind to it)."""
    tri = verts_screen[faces]
    ys = tri[:, :, 1]
    ymin, ymax = ys.min(1), ys.max(1)
    xs = tri[:, :, 0]
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    live = jnp.abs(area) >= 1e-9
    by = jnp.arange(height // band_h, dtype=jnp.float32) * band_h
    b_hit = ((ymin[None] <= by[:, None] + band_h)
             & (ymax[None] >= by[:, None]) & live[None])
    counts = b_hit.sum(axis=1)
    return counts.max(), jnp.sum(counts > band_cap)


def _attr_planes(attr_flat: jnp.ndarray, height: int, width: int,
                 col_tile: int) -> jnp.ndarray:
    """(n_ty*n_tx, N_ATTR, px) tile-major kernel output -> (N_ATTR, H, W).

    PLANAR (channel-major) on purpose: every downstream shading op then
    runs on (H, W) planes whose minor dim is W — full 128-lane VPU
    occupancy. The previous channel-minor (H, W, N_ATTR) contract put C
    in {3, 16} on the lane axis, so each of the ~12 shading/compose ops
    at 2048px materialized a lane-padded ~50 MB intermediate (12 pad +
    8 maximum ops of (2048,2048,3) f32 counted in the fused-step HLO) —
    measured at ~15 ms of the 2048px frame."""
    n_ty, n_tx = height // ROW_TILE, width // col_tile
    a = attr_flat.reshape(n_ty, n_tx, N_ATTR, ROW_TILE, col_tile)
    return a.transpose(2, 0, 3, 1, 4).reshape(N_ATTR, height, width)


@functools.partial(jax.jit, static_argnames=("height", "width", "bin_cap",
                                             "interpret"))
def rasterize_pallas_binned(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                            height: int, width: int, bin_cap: int = 512,
                            interpret: bool = False, attrs=None):
    """Binned variant of rasterize_pallas: O(pixels x faces-per-tile).

    The flat kernel sweeps EVERY face for every pixel tile — linear in
    image area x face count, ~350 ms/frame extrapolated at 2048px. Here
    a JAX prestage bins faces by bbox into fixed-capacity per-tile
    lists (one stable argsort + gather), and the kernel folds only its
    own tile's ``bin_cap`` slots: 26 face chunks become 4 at the
    default capacity. Same output contract as rasterize_pallas /
    viz.raster.rasterize; bit-identical while no tile overflows
    ``bin_cap`` (see _bin_faces).

    ``attrs`` (N_ATTR, F) float32 per-face attribute rows adds a third
    return: the winning face's rows per pixel, (H, W, N_ATTR), zeros on
    background — picked in-kernel on the MXU (see _attr_pick), which
    replaces the slow per-pixel gather a shading stage would need.
    """
    f_total = faces.shape[0]
    assert f_total % FACE_CHUNK == 0
    assert bin_cap % FACE_CHUNK == 0
    bin_cap = min(bin_cap, f_total)      # capacity beyond F is vacuous
    col_tile = min(COL_TILE, width)
    assert height % ROW_TILE == 0 and width % col_tile == 0
    n_ty, n_tx = height // ROW_TILE, width // col_tile
    n_chunks = bin_cap // FACE_CHUNK
    with_attrs = attrs is not None

    tri = verts_screen[faces]                        # (F, 3, 3)
    tri_rows = tri.transpose(1, 2, 0).reshape(9, f_total)
    pad_rows = jnp.zeros((7, f_total), tri_rows.dtype)
    if with_attrs:
        # one combined (32, F) table -> ONE binned gather serves both
        # the geometry rows and the attribute rows
        tri_rows = jnp.concatenate(
            [tri_rows, pad_rows, attrs.astype(tri_rows.dtype)], axis=0)
    else:
        tri_rows = jnp.concatenate([tri_rows, pad_rows], axis=0)
    n_rows = tri_rows.shape[0]
    xs = tri[:, :, 0]
    ys = tri[:, :, 1]
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)[None, :]

    tri_t, inv_t, ids_t, counts = _bin_faces(tri_rows, inv_area, height,
                                             width, col_tile, bin_cap)
    nchunks_t = (counts + FACE_CHUNK - 1) // FACE_CHUNK      # (T,) int32

    kernel = functools.partial(_raster_kernel_binned, n_chunks=n_chunks,
                               col_tile=col_tile, with_attrs=with_attrs)
    grid = (n_ty, n_tx)
    # the per-tile chunk counts ride as a scalar-prefetch operand (the
    # one whole-array-in-SMEM form this toolchain's mosaic lowers);
    # index maps therefore take the scalar ref as a trailing argument
    out_spec = pl.BlockSpec((ROW_TILE, col_tile), lambda i, j, nc: (i, j),
                            memory_space=pltpu.VMEM)
    tile_ix = lambda i, j, nc: (i * n_tx + j, 0, 0)
    out_specs = [out_spec, out_spec, out_spec]
    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
    ]
    if with_attrs:
        out_specs.append(pl.BlockSpec(
            (1, N_ATTR, ROW_TILE * col_tile), tile_ix,
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (n_ty * n_tx, N_ATTR, ROW_TILE * col_tile), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n_rows, bin_cap), tile_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bin_cap), tile_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bin_cap), tile_ix,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(nchunks_t, tri_t, inv_t, ids_t)
    fid, b0, b1 = outs[:3]
    if with_attrs:
        # bary as a TUPLE of three (H, W) planes alongside the planar
        # attr planes: no stack is materialized at all — each plane
        # fuses into shade_from_attrs' per-plane arithmetic, and the
        # background mask is a full-lane (H, W) select. (A channel-minor
        # (H, W, 3) stack put 3 channels on the 128-lane axis; a
        # channel-major (3, H, W) stack materialized ~50 MB per op at
        # 2048px before shade unstacked it again.)
        mask = fid >= 0
        bary = tuple(jnp.where(mask, b, 0.0)
                     for b in (b0, b1, 1.0 - b0 - b1))
        return fid, bary, _attr_planes(outs[3], height, width, col_tile)
    bary = jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)
    bary = jnp.where((fid >= 0)[..., None], bary, 0.0)
    return fid, bary


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize_pallas(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                     height: int, width: int,
                     interpret: bool = False, attrs=None):
    """Drop-in replacement for viz.raster.rasterize.

    verts_screen (V, 3) = (u, v, depth); faces (F, 3) int32, F a
    multiple of FACE_CHUNK (pad with degenerate faces).
    Returns (face_id (H, W) int32 with -1 background, bary (H, W, 3)).
    Optional ``attrs`` (N_ATTR, F) float32 adds a third return — the
    winning face's attribute rows per pixel, (H, W, N_ATTR), zeros on
    background (see rasterize_pallas_binned).
    """
    f_total = faces.shape[0]
    assert f_total % FACE_CHUNK == 0
    col_tile = min(COL_TILE, width)
    assert height % ROW_TILE == 0 and width % col_tile == 0
    n_ty, n_tx = height // ROW_TILE, width // col_tile
    n_chunks = f_total // FACE_CHUNK
    with_attrs = attrs is not None

    tri = verts_screen[faces]                        # (F, 3, 3)
    # rows: ax ay az bx by bz cx cy cz -> (16, F) sublane-padded
    tri_rows = tri.transpose(1, 2, 0).reshape(9, f_total)
    tri_rows = jnp.concatenate(
        [tri_rows, jnp.zeros((7, f_total), tri_rows.dtype)], axis=0)

    xs = tri[:, :, 0]
    ys = tri[:, :, 1]
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)[None, :]

    kernel = functools.partial(_raster_kernel, n_chunks=n_chunks,
                               col_tile=col_tile, with_attrs=with_attrs)
    grid = (n_ty, n_tx)
    out_spec = pl.BlockSpec((ROW_TILE, col_tile), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((16, f_total), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_total), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [tri_rows, inv_area]
    out_specs = [out_spec, out_spec, out_spec]
    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
    ]
    if with_attrs:
        in_specs.append(pl.BlockSpec((N_ATTR, f_total), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(attrs.astype(jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, N_ATTR, ROW_TILE * col_tile),
            lambda i, j: (i * n_tx + j, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (n_ty * n_tx, N_ATTR, ROW_TILE * col_tile), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    fid, b0, b1 = outs[:3]
    if with_attrs:
        # per-plane bary tuple, matching rasterize_pallas_binned
        mask = fid >= 0
        bary = tuple(jnp.where(mask, b, 0.0)
                     for b in (b0, b1, 1.0 - b0 - b1))
        return fid, bary, _attr_planes(outs[3], height, width, col_tile)
    bary = jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)
    # background pixels keep bary 0 like the scan rasterizer
    bary = jnp.where((fid >= 0)[..., None], bary, 0.0)
    return fid, bary
