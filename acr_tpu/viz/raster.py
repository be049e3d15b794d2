"""On-device mesh renderer: z-buffer rasterizer + Lambert shading in JAX.

Replaces the reference's native render backends — pyrender/OpenGL and
pytorch3d CUDA (reference: acr/renderer/renderer_pyrd.py,
renderer_pt3d.py) — with a fixed-shape XLA program sized for MANO
meshes (2 hands x 1538 faces at up to 2048px).

Camera model (matching the pyrender setup, renderer_pyrd.py:20-47):
camera at the origin, IntrinsicsCamera(f, f, cx, cy); the reference
rotates meshes 180deg about x and lets OpenGL look down -z, which for
pixel coordinates reduces to a direct pinhole with image-down y:

    u = f * x / z + cx,   v = f * y / z + cy,   z > 0 visible.

Lighting reduces the same way: the scene's three intensity-0.5
directional lights all point along the world -z axis with 0.3 ambient
(renderer_pyrd.py:49-75), which in un-rotated mesh coordinates is a
single Lambert term on -normal_z.

Rasterization strategy: ``lax.scan`` over face chunks per image
row-tile, carrying (z, face_id, barycentrics) buffers — bounded memory,
fully fused by XLA, and shape-static so one compilation serves a whole
video. Barycentric-interpolated vertex normals give smooth shading
(pyrender's smooth=True default).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

VISIBLE_WEIGHT = 0.9          # reference: acr/visualization.py:157
# hand colors indexed by type (0=left, 1=right); reference pre_colors
# (acr/visualization.py:76)
PRE_COLORS = np.array([[0.46, 0.59, 0.64], [0.94, 0.71, 0.53]], np.float32)


def compute_vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals. verts (V,3), faces (F,3) -> (V,3)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)            # area-weighted face normals
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    norm = jnp.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / jnp.maximum(norm, 1e-12)


def _project(verts: jnp.ndarray, focal: float, cx: float, cy: float):
    """(V, 3) camera-space -> (u, v) pixels + depth, z clamped positive."""
    z = jnp.maximum(verts[:, 2], 1e-4)
    u = focal * verts[:, 0] / z + cx
    v = focal * verts[:, 1] / z + cy
    return jnp.stack([u, v, z], axis=-1)


def fov_focal_px(fov_deg: float, size: int) -> float:
    """Pixel focal length of a FoV perspective camera.

    pytorch3d's FoVPerspectiveCameras(fov) maps the half-FoV to the NDC
    edge, i.e. focal = (size/2) / tan(fov/2) in pixels
    (reference: acr/renderer/renderer_pt3d.py:74-86, fov=args().FOV).
    """
    return (size / 2.0) / float(np.tan(np.radians(fov_deg) / 2.0))


def _project_ortho(verts: jnp.ndarray, half: float, cx: float, cy: float):
    """FoV-orthographic projection: parallel rays, unit NDC box.

    pytorch3d's FoVOrthographicCameras with the default [-1, 1] extents
    (reference: renderer_pt3d.py:88-110); its xy negation + NDC->screen
    flip compose to the same image-down pixel convention as the pinhole
    path, so u = cx + (size/2) * x. Depth is camera z (still z-buffered
    so self-occlusion resolves; no perspective foreshortening).
    """
    u = half * verts[:, 0] + cx
    v = half * verts[:, 1] + cy
    z = jnp.maximum(verts[:, 2], 1e-4)
    return jnp.stack([u, v, z], axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "row_tile",
                                             "face_chunk"))
def rasterize(verts_screen: jnp.ndarray,
              faces: jnp.ndarray,
              height: int, width: int,
              row_tile: int = 64,
              face_chunk: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Z-buffer rasterization.

    verts_screen: (V, 3) — (u, v, depth); faces: (F, 3) int32 (pad F to
    a multiple of face_chunk with degenerate faces).
    Returns (face_id (H, W) int32, -1 = background;
             bary (H, W, 3) float32 barycentric coords of the winner).
    """
    f_total = faces.shape[0]
    assert f_total % face_chunk == 0, "pad faces to a face_chunk multiple"
    n_chunks = f_total // face_chunk
    assert height % row_tile == 0
    n_tiles = height // row_tile

    tri = verts_screen[faces]                   # (F, 3, 3)
    xs = tri[:, :, 0]
    ys = tri[:, :, 1]
    zs = tri[:, :, 2]
    # signed double-area; degenerate faces excluded via |area| eps
    area = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0]))
    inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    chunk_ids = jnp.arange(n_chunks)

    def render_tile(tile_idx):
        py = (jnp.arange(row_tile, dtype=jnp.float32)
              + tile_idx * row_tile + 0.5)
        gx = px[None, :, None]                  # (1, W, 1)
        gy = py[:, None, None]                  # (T, 1, 1)

        def face_chunk_step(carry, ci):
            zbuf, fid, bary = carry
            sl = ci * face_chunk
            cxs = jax.lax.dynamic_slice(xs, (sl, 0), (face_chunk, 3))
            cys = jax.lax.dynamic_slice(ys, (sl, 0), (face_chunk, 3))
            czs = jax.lax.dynamic_slice(zs, (sl, 0), (face_chunk, 3))
            cinv = jax.lax.dynamic_slice(inv_area, (sl,), (face_chunk,))

            # barycentric coordinates per (pixel, face)
            def edge(ax, ay, bx, by):
                return ((bx - ax) * (gy - ay[None, None, :])
                        - (by - ay) * (gx - ax[None, None, :]))

            w0 = edge(cxs[:, 1], cys[:, 1], cxs[:, 2], cys[:, 2]) * cinv
            w1 = edge(cxs[:, 2], cys[:, 2], cxs[:, 0], cys[:, 0]) * cinv
            w2 = 1.0 - w0 - w1
            inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                      & (cinv != 0.0)[None, None, :])
            depth = (w0 * czs[:, 0] + w1 * czs[:, 1] + w2 * czs[:, 2])
            depth = jnp.where(inside, depth, jnp.inf)

            best = jnp.argmin(depth, axis=-1)               # (T, W)
            best_z = jnp.take_along_axis(depth, best[..., None], -1)[..., 0]
            take = lambda w: jnp.take_along_axis(w, best[..., None], -1)[..., 0]
            new_bary = jnp.stack([take(w0), take(w1), take(w2)], axis=-1)

            win = best_z < zbuf
            zbuf = jnp.where(win, best_z, zbuf)
            fid = jnp.where(win, sl + best, fid)
            bary = jnp.where(win[..., None], new_bary, bary)
            return (zbuf, fid, bary), None

        init = (jnp.full((row_tile, width), jnp.inf),
                jnp.full((row_tile, width), -1, jnp.int32),
                jnp.zeros((row_tile, width, 3)))
        (zbuf, fid, bary), _ = jax.lax.scan(face_chunk_step, init, chunk_ids)
        return fid, bary

    fids, barys = jax.lax.map(render_tile, jnp.arange(n_tiles))
    return (fids.reshape(height, width),
            barys.reshape(height, width, 3))


def shade(face_id: jnp.ndarray, bary: jnp.ndarray, faces: jnp.ndarray,
          normals: jnp.ndarray, face_colors: jnp.ndarray,
          ambient: float = 0.3, directional: float = 1.5) -> jnp.ndarray:
    """Lambert shading -> (H, W, 4) RGBA in [0, 1]; alpha = coverage.

    directional=1.5 aggregates the reference's three 0.5-intensity
    lights along -z (renderer_pyrd.py:49,68-75).
    """
    safe_id = jnp.maximum(face_id, 0)
    tri_n = normals[faces[safe_id]]                    # (H, W, 3, 3)
    n = jnp.einsum("hwk,hwkc->hwc", bary, tri_n)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    lambert = jnp.maximum(0.0, -n[..., 2])
    intensity = jnp.clip(ambient + directional * lambert, 0.0, 1.0)
    rgb = face_colors[safe_id] * intensity[..., None]
    alpha = (face_id >= 0).astype(rgb.dtype)
    return jnp.concatenate([rgb * alpha[..., None], alpha[..., None]], axis=-1)


def shade_from_attrs(face_id: jnp.ndarray,
                     bary_planes: Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray],
                     attr_planes: jnp.ndarray,
                     ambient: float = 0.3,
                     directional: float = 1.5,
                     planar: bool = False) -> jnp.ndarray:
    """shade() from in-kernel-picked per-face attribute rows.

    ``attr_planes`` (N_ATTR, H, W) channel-major planes: rows 0..8 =
    the winning face's corner normals [n0x n0y n0z n1x .. n2z] (zeros
    on background), 9..11 = its hand color — produced by the pallas
    kernels' exact one-hot MXU pick, so the values are bit-identical
    to shade()'s per-pixel gathers wherever face_id >= 0; the final
    RGBA is identical everywhere because background rgb is
    premultiplied by alpha = 0 in both paths.

    All arithmetic runs on (H, W) planes (minor dim = W, full 128-lane
    VPU occupancy). The previous channel-minor (H, W, C) formulation
    put C in {3, 16} on the lane axis and materialized a lane-padded
    ~50 MB intermediate per op at 2048px — ~15 ms/frame of pure layout
    waste (counted in the fused-step HLO: 12 pad + 8 maximum ops of
    (2048,2048,3) f32). Only the final (H, W, 4) RGBA stack leaves
    planar form, to keep the public contract — unless ``planar=True``,
    which returns (4, H, W) so downstream device stages (the uint8
    pack in pipeline/app.pack_outputs) also run at full lane occupancy
    and the one channel-minor transpose moves to the HOST unpack
    (a numpy moveaxis on 4 MB of uint8, effectively free).
    """
    # bary arrives as a TUPLE of (H, W) planes from the with-attrs
    # rasterize paths (no channel stack materialized on device); a
    # stacked (H, W, 3) array would type-check but index pixel rows
    # (ADVICE r4), so the contract is enforced here
    assert isinstance(bary_planes, tuple) and len(bary_planes) == 3, \
        "bary_planes must be a tuple of three (H, W) planes"
    b0, b1, b2 = bary_planes
    # interpolated normal, per component (same reduction order as the
    # einsum "hwk,hwkc->hwc" it replaces: k ascending)
    n = [b0 * attr_planes[c] + b1 * attr_planes[3 + c]
         + b2 * attr_planes[6 + c] for c in range(3)]
    norm = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    nz = n[2] / jnp.maximum(norm, 1e-12)
    lambert = jnp.maximum(0.0, -nz)
    intensity = jnp.clip(ambient + directional * lambert, 0.0, 1.0)
    alpha = (face_id >= 0).astype(intensity.dtype)
    rgb = [(attr_planes[9 + c] * intensity) * alpha for c in range(3)]
    return jnp.stack(rgb + [alpha], axis=0 if planar else -1)


def _scene_screen_faces(all_verts: jnp.ndarray, detection_flag: jnp.ndarray,
                        faces: jnp.ndarray, verts_per_hand: int, size: int,
                        focal: float, camera: str, fov_deg: float):
    """Shared scene prep: offset/mask faces, pad to a chunk multiple,
    project to screen. Used by render_hands and the overflow probe so
    their geometry can never desynchronize."""
    offs = jnp.arange(2, dtype=faces.dtype)[:, None, None] * verts_per_hand
    all_faces = jnp.where(detection_flag[:, None, None], faces + offs, 0)
    all_faces = all_faces.reshape(-1, 3)
    # pad to a face-chunk multiple with degenerate faces
    pad = (-all_faces.shape[0]) % 128
    all_faces = jnp.concatenate(
        [all_faces, jnp.zeros((pad, 3), all_faces.dtype)], axis=0)
    if camera == "ortho":
        screen = _project_ortho(all_verts, size / 2.0, size / 2.0, size / 2.0)
    else:
        f = fov_focal_px(fov_deg, size) if camera == "fov" else focal
        screen = _project(all_verts, f, size / 2.0, size / 2.0)
    return screen, all_faces, pad


@functools.partial(jax.jit, static_argnames=("size", "focal", "camera",
                                             "fov_deg"))
def render_overflow_probe(verts: jnp.ndarray, cam_trans: jnp.ndarray,
                          detection_flag: jnp.ndarray, faces: jnp.ndarray,
                          size: int = 512, focal: float = 1265.0,
                          camera: str = "intrinsics",
                          fov_deg: float = 22.5):
    """Rasterizer capacity telemetry for one frame's scene.

    Same geometry prep as render_hands, then the bbox-overlap counts
    against the capacities the kernel dispatch would actually use at
    this ``size``. Returns ONE (4,) int32 device vector —
    [max_faces_per_tile, n_overflowing_tiles,
     max_faces_per_band, n_overflowing_bands] —
    so it packs into the fused steps' single buffer and stacks under
    lax.map. Dispatch it alongside the frame's render and ride the
    existing single readback.

    A nonzero [1] means tiles above the tile cap; a nonzero [3] means
    row bands above the banded kernel's table capacity. EITHER makes
    render_hands' high-res path (size >= 1024) take the exact flat
    fallback for the whole frame, so both must be watched — a
    band-concentrated scene can overflow with every tile under cap
    (the tile-only probe was blind to that regime). Below 1024px the
    band fields are always 0 (the banded kernel is not in the
    dispatch there).
    """
    from acr_tpu.viz.raster_pallas import (band_overflow_stats,
                                           bin_cap_for,
                                           bin_overflow_stats)
    v_world = verts + cam_trans[:, None, :]
    all_verts = v_world.reshape(-1, 3)
    screen, all_faces, _ = _scene_screen_faces(
        all_verts, detection_flag, faces, verts.shape[1], size, focal,
        camera, fov_deg)
    mx_t, n_t = bin_overflow_stats(screen, all_faces, size, size,
                                   cap=bin_cap_for(size))
    f_total = all_faces.shape[0]
    if size >= 1024 and f_total > 128:     # mirrors render_hands' gate
        from acr_tpu.viz.raster_pallas import BAND_CAP, BAND_H
        mx_b, n_b = band_overflow_stats(
            screen, all_faces, size, band_h=BAND_H,
            band_cap=min(BAND_CAP, f_total))
    else:
        mx_b = n_b = jnp.zeros((), jnp.int32)
    return jnp.stack([mx_t, n_t, mx_b, n_b]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("size", "focal", "backend",
                                             "camera", "fov_deg",
                                             "interpret", "planar"))
def render_hands(verts: jnp.ndarray,
                 cam_trans: jnp.ndarray,
                 detection_flag: jnp.ndarray,
                 faces: jnp.ndarray,
                 size: int = 512,
                 focal: float = 1265.0,
                 backend: str = "auto",
                 camera: str = "intrinsics",
                 fov_deg: float = 22.5,
                 interpret: bool = False,
                 planar: bool = False) -> jnp.ndarray:
    """Render both hand meshes of one image -> (size, size, 4) RGBA
    (``planar=True``: (4, size, size) channel-major — full-lane device
    layout for jitted consumers; see shade_from_attrs).

    verts (2, 778, 3) root-relative; cam_trans (2, 3) metric camera
    translation; detection_flag (2,) bool; faces (2, 1538, 3).
    Undetected hands are removed by collapsing their faces to a
    degenerate vertex (zero area -> never rasterized).

    backend: 'pallas' (VMEM-resident kernel, ~14x faster on TPU),
    'scan' (pure lax.scan, any platform), or 'auto' (pallas on TPU
    backends, scan on CPU).

    camera: 'intrinsics' (pyrender IntrinsicsCamera with ``focal``,
    reference: renderer_pyrd.py:20-47), 'fov' (pytorch3d
    FoVPerspectiveCameras(fov=fov_deg), reference:
    renderer_pt3d.py:74-86), or 'ortho' (FoVOrthographicCameras,
    renderer_pt3d.py:88-110).
    """
    v_world = verts + cam_trans[:, None, :]            # (2, 778, 3)
    all_verts = v_world.reshape(-1, 3)
    screen, all_faces, pad = _scene_screen_faces(
        all_verts, detection_flag, faces, verts.shape[1], size, focal,
        camera, fov_deg)

    normals = compute_vertex_normals(all_verts, all_faces)
    hand_of_face = jnp.concatenate(
        [jnp.zeros(faces.shape[1], jnp.int32),
         jnp.ones(faces.shape[1], jnp.int32),
         jnp.zeros(pad, jnp.int32)])
    face_colors = jnp.asarray(PRE_COLORS)[hand_of_face]
    if backend == "auto":
        backend = "scan" if jax.default_backend() == "cpu" else "pallas"
    if backend == "pallas":
        from acr_tpu.viz.raster_pallas import (
            N_ATTR, bin_cap_for, bin_overflow_stats, rasterize_pallas,
            rasterize_pallas_binned)
        # per-face attribute rows picked in-kernel for the winning
        # face (exact one-hot matmul on the otherwise-idle MXU): rows
        # 0..8 = the three corner normals, 9..11 = the hand color.
        # This replaces shade()'s per-pixel (H, W, 3, 3) normal gather
        # + (H, W, 3) color gather — TPU gathers lower to per-element
        # loops whose cost scales with pixel count. Measured A/B on the
        # two-hand template scene (v5e, scalar-readback methodology):
        # full render 10.02 -> 5.57 ms/frame at 512px (1.8x) and
        # 124.8 -> 48.3 ms at 2048px (2.6x; the gather is ~80 ms of
        # the high-res frame). docs/PERFORMANCE.md "Rendering".
        f_total = all_faces.shape[0]
        corner_n = normals[all_faces].transpose(1, 2, 0)     # (3, 3, F)
        attrs = jnp.concatenate([
            corner_n.reshape(9, f_total),
            face_colors.T,
            jnp.zeros((N_ATTR - 12, f_total), jnp.float32)], axis=0)
        # bbox-binned per-tile face lists: O(pixels x faces/tile)
        # instead of O(pixels x faces), with ADAPTIVE capacity: the
        # kernel's cost is linear in the bin capacity (measured 1.45 /
        # 2.80 / 4.98 ms at cap 128/256/512, 512px), and the prestage
        # probe already knows this frame's true max bbox-overlap count
        # (203 for the template two-hand scene), so a lax.switch picks
        # the smallest sufficient capacity tier — each tier its own
        # precompiled static-shape kernel. Exactness guarantee: a tile
        # count above the largest tier (extreme close-ups / degenerate
        # cameras — observed live via the overflow probe) selects the
        # flat kernel for THIS frame instead of silently dropping
        # faces; only the taken branch executes.
        cap = bin_cap_for(size)
        if size >= 1024 and f_total > 128:
            # high-resolution path: the TWO-LEVEL banded kernel. At
            # 2048px the single-level prestage's (T, 32, cap) face-row
            # gather dominates the render (10.3 ms gather + 3.3 ms
            # relayout of the 40.5 ms fused step); banding gathers face
            # data once per 256px row band and tiles carry only int32
            # slot indices (raster_pallas._raster_kernel_banded).
            # Exactness gate mirrors the tier logic: a frame whose
            # tiles exceed ``cap`` OR whose bands exceed ``band_cap``
            # takes the flat kernel instead of dropping faces.
            from acr_tpu.viz.raster_pallas import (BAND_CAP, BAND_H,
                                                   banded_overflow_stats,
                                                   rasterize_pallas_banded)
            band_cap = BAND_CAP
            mx_t, mx_b = banded_overflow_stats(screen, all_faces, size,
                                               size, band_h=BAND_H)
            idx = ((mx_t > cap) | (mx_b > min(band_cap, f_total))
                   ).astype(jnp.int32)
            out = jax.lax.switch(idx, [
                lambda s, f: rasterize_pallas_banded(
                    s, f, size, size, band_cap=band_cap, bin_cap=cap,
                    band_h=BAND_H, interpret=interpret, attrs=attrs),
                lambda s, f: rasterize_pallas(s, f, size, size,
                                              interpret=interpret,
                                              attrs=attrs),
            ], screen, all_faces)
            face_id, bary, attr_img = out
            return shade_from_attrs(face_id, bary, attr_img, planar=planar)
        tiers = [c for c in (128, 256, 512) if c <= cap and c < f_total]
        if tiers:
            mx, _ = bin_overflow_stats(screen, all_faces, size, size,
                                       cap=cap)
            idx = sum((mx > c).astype(jnp.int32) for c in tiers)

            def make_binned(c):
                return lambda s, f: rasterize_pallas_binned(
                    s, f, size, size, bin_cap=c, interpret=interpret,
                    attrs=attrs)

            branches = [make_binned(c) for c in tiers] + [
                lambda s, f: rasterize_pallas(s, f, size, size,
                                              interpret=interpret,
                                              attrs=attrs)]
            out = jax.lax.switch(idx, branches, screen, all_faces)
        else:
            out = rasterize_pallas(screen, all_faces, size, size,
                                   interpret=interpret, attrs=attrs)
        face_id, bary, attr_img = out
        return shade_from_attrs(face_id, bary, attr_img, planar=planar)
    face_id, bary = rasterize(screen, all_faces, size, size)
    rgba = shade(face_id, bary, all_faces, normals, face_colors)
    return jnp.moveaxis(rgba, -1, 0) if planar else rgba
