"""Pallas rasterizer vs the lax.scan rasterizer (interpret mode on CPU).

Natively validated on TPU: bit-identical face selection and a ~14x
speedup (306 -> 22 ms/frame at 512px, docs/PERFORMANCE.md).
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial import ConvexHull

from acr_tpu.viz.raster import _project, rasterize, render_hands
from acr_tpu.viz.raster_pallas import (
    FACE_CHUNK,
    _bin_faces,
    bin_overflow_stats,
    rasterize_pallas,
    rasterize_pallas_binned,
)


def make_geometry(rng, n_pts=300, z=1.0):
    pts = rng.randn(n_pts, 3).astype(np.float32) * 0.05
    faces = ConvexHull(pts).simplices.astype(np.int32)
    pad = (-len(faces)) % FACE_CHUNK
    faces = np.concatenate([faces, np.zeros((pad, 3), np.int32)])
    screen = _project(jnp.asarray(pts + np.array([0, 0, z], np.float32)),
                      200.0, 64.0, 64.0)
    return screen, jnp.asarray(faces)


def test_matches_scan_rasterizer(rng):
    screen, faces = make_geometry(rng)
    fid0, bary0 = rasterize(screen, faces, 128, 128)
    fid1, bary1 = rasterize_pallas(screen, faces, 128, 128, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    np.testing.assert_allclose(np.asarray(bary0), np.asarray(bary1), atol=1e-5)


def test_multiple_column_tiles(rng):
    # width 512 -> two 256-wide column tiles; tile seams must be invisible
    screen, faces = make_geometry(rng)
    screen = screen.at[:, 0].mul(4.0)      # spread across the full width
    fid0, _ = rasterize(screen, faces, 64, 512)
    fid1, _ = rasterize_pallas(screen, faces, 64, 512, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))


def test_empty_scene():
    screen = jnp.zeros((3, 3))
    faces = jnp.zeros((FACE_CHUNK, 3), jnp.int32)     # all degenerate
    fid, bary = rasterize_pallas(screen, faces, 64, 128, interpret=True)
    assert (np.asarray(fid) == -1).all()
    assert (np.asarray(bary) == 0).all()


# ---------------------------------------------------------------------------
# binned kernel (the render_size=2048 path; also fewer chunks at 512)
# ---------------------------------------------------------------------------

def test_binned_matches_scan(rng):
    # two hulls -> ~256 faces total with capacity 128: tiles really do
    # select face subsets, and the result must still be bit-identical
    s1, f1 = make_geometry(rng, n_pts=300)
    s2, f2 = make_geometry(rng, n_pts=300)
    s1 = s1.at[:, 0].add(-30.0)
    s2 = s2.at[:, 0].add(30.0)
    screen = jnp.concatenate([s1, s2])
    faces = jnp.concatenate([f1, f2 + s1.shape[0]])
    assert faces.shape[0] > 128
    fid0, bary0 = rasterize(screen, faces, 128, 128)
    fid1, bary1 = rasterize_pallas_binned(screen, faces, 128, 128,
                                          bin_cap=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    np.testing.assert_allclose(np.asarray(bary0), np.asarray(bary1),
                               atol=1e-5)


def test_binned_multiple_column_tiles(rng):
    screen, faces = make_geometry(rng)
    screen = screen.at[:, 0].mul(4.0)
    fid0, _ = rasterize(screen, faces, 64, 512)
    fid1, _ = rasterize_pallas_binned(screen, faces, 64, 512,
                                      bin_cap=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))


def test_binned_empty_scene():
    screen = jnp.zeros((3, 3))
    faces = jnp.zeros((FACE_CHUNK * 2, 3), jnp.int32)
    fid, bary = rasterize_pallas_binned(screen, faces, 64, 128,
                                        bin_cap=FACE_CHUNK, interpret=True)
    assert (np.asarray(fid) == -1).all()
    assert (np.asarray(bary) == 0).all()


def test_binned_overflow_drops_highest_ids(rng):
    # 2*FACE_CHUNK faces all covering one point, capacity FACE_CHUNK:
    # the winner must come from the kept (lowest-id) half
    n = 2 * FACE_CHUNK
    tris = []
    for k in range(n):
        # stacked triangles covering pixel (32, 32), nearer for higher k
        tris.append([[20, 20, 1.0 - k * 1e-3],
                     [44, 20, 1.0 - k * 1e-3],
                     [32, 44, 1.0 - k * 1e-3]])
    verts = jnp.asarray(np.asarray(tris, np.float32).reshape(-1, 3))
    faces = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
    fid, _ = rasterize_pallas_binned(verts, faces, 64, 128,
                                     bin_cap=FACE_CHUNK, interpret=True)
    fid = np.asarray(fid)
    covered = fid[fid >= 0]
    assert covered.size > 0
    # nearest KEPT face wins: the highest id below capacity
    assert covered.max() == FACE_CHUNK - 1


# ---------------------------------------------------------------------------
# banded (two-level) kernel — the high-resolution path: per-band face
# tables + per-tile slot lists + in-kernel one-hot MXU row fetch
# ---------------------------------------------------------------------------

def test_banded_matches_scan(rng):
    from acr_tpu.viz.raster_pallas import rasterize_pallas_banded
    s1, f1 = make_geometry(rng, n_pts=300)
    s2, f2 = make_geometry(rng, n_pts=300)
    s1 = s1.at[:, 0].add(-30.0).at[:, 1].add(-20.0)
    s2 = s2.at[:, 0].add(30.0).at[:, 1].add(20.0)
    screen = jnp.concatenate([s1, s2])
    faces = jnp.concatenate([f1, f2 + s1.shape[0]])
    assert faces.shape[0] > 128
    fid0, bary0 = rasterize(screen, faces, 128, 128)
    # band_h 32 -> 4 bands; band_cap 256 < f_total -> bands really
    # select face subsets; bin_cap 128 -> tiles select sub-subsets
    fid1, bary1 = rasterize_pallas_banded(
        screen, faces, 128, 128, band_cap=256, bin_cap=128, band_h=32,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    np.testing.assert_allclose(np.asarray(bary0), np.asarray(bary1),
                               atol=1e-5)


def test_banded_matches_binned_with_attrs(rng):
    from acr_tpu.viz.raster_pallas import (rasterize_pallas_banded,
                                           rasterize_pallas_binned)
    s1, f1 = make_geometry(rng, n_pts=300)
    s2, f2 = make_geometry(rng, n_pts=300)
    s1 = s1.at[:, 1].add(-25.0)
    s2 = s2.at[:, 1].add(25.0)
    screen = jnp.concatenate([s1, s2])
    faces = jnp.concatenate([f1, f2 + s1.shape[0]])
    attrs = _random_attrs(rng, faces.shape[0])
    fid0, bary0, at0 = rasterize_pallas_binned(
        screen, faces, 128, 128, bin_cap=256, interpret=True, attrs=attrs)
    fid1, bary1, at1 = rasterize_pallas_banded(
        screen, faces, 128, 128, band_cap=256, bin_cap=256, band_h=64,
        interpret=True, attrs=attrs)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    for p0, p1 in zip(bary0, bary1):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(at0), np.asarray(at1))


def test_banded_empty_scene():
    from acr_tpu.viz.raster_pallas import rasterize_pallas_banded
    screen = jnp.zeros((3, 3))
    faces = jnp.zeros((FACE_CHUNK * 2, 3), jnp.int32)
    fid, bary = rasterize_pallas_banded(screen, faces, 64, 128,
                                        band_cap=FACE_CHUNK,
                                        bin_cap=FACE_CHUNK, band_h=32,
                                        interpret=True)
    assert (np.asarray(fid) == -1).all()
    assert (np.asarray(bary) == 0).all()


def test_banded_overflow_stats(rng):
    from acr_tpu.viz.raster_pallas import banded_overflow_stats
    screen, faces = make_geometry(rng)
    mx_t, mx_b = banded_overflow_stats(screen, faces, 128, 128, band_h=32)
    mx_t2, _ = bin_overflow_stats(screen, faces, 128, 128, cap=10000)
    # tile counts agree with the single-level probe; band counts bound
    # tile counts from above (a band is a superset of its tiles)
    assert int(mx_t) == int(mx_t2)
    assert int(mx_b) >= int(mx_t) > 0


def test_render_hands_highres_banded_matches_scan(rng):
    """size >= 1024 rides the banded two-level kernel through
    render_hands; output must equal the scan backend exactly (same
    guarantee the tier switch gives at low res)."""
    half = 0.04
    quad = np.array([[-half, -half, 0], [half, -half, 0],
                     [half, half, 0], [-half, half, 0]], np.float32)
    verts = jnp.asarray(np.stack([quad + [-0.1, -0.08, 0],
                                  quad + [0.1, 0.08, 0]]))
    faces_quad = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # >128 faces total so the banded path (not the small-mesh flat
    # shortcut) is taken
    faces = jnp.asarray(np.tile(np.concatenate(
        [faces_quad, np.zeros((98, 3), np.int32)]), (2, 1, 1)))
    trans = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    det = jnp.asarray([True, True])
    kw = dict(size=1024, focal=1600.0)
    a = render_hands(verts, trans, det, faces, backend="pallas",
                     interpret=True, **kw)
    b = render_hands(verts, trans, det, faces, backend="scan", **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert float(np.asarray(a)[..., 3].sum()) > 0      # something drawn


def test_bin_overflow_stats(rng):
    screen, faces = make_geometry(rng)
    mx, n_over = bin_overflow_stats(screen, faces, 128, 128, cap=4)
    mx2, n_ok = bin_overflow_stats(screen, faces, 128, 128, cap=10000)
    assert int(mx) == int(mx2) > 4
    assert int(n_over) > 0 and int(n_ok) == 0


def test_render_hands_overflow_falls_back_exact(rng):
    """A scene whose tiles exceed bin capacity must render EXACTLY like
    the scan backend: the lax.cond fallback takes the flat kernel, so
    no face is ever silently dropped (observed live on the magic.jpg
    demo: 1191 faces in one tile vs capacity 512)."""
    from acr_tpu.viz.raster import render_hands
    # both hands collapsed near the image center -> extreme face density
    verts = jnp.asarray(rng.randn(2, 778, 3).astype(np.float32) * 0.005)
    cam_trans = jnp.asarray(np.array([[0.0, 0.0, 0.4], [0.01, 0.0, 0.4]],
                                     np.float32))
    faces = jnp.asarray(rng.randint(0, 778, (2, 1538, 3)).astype(np.int32))
    det = jnp.array([True, True])
    kw = dict(size=128, focal=120.0)
    from acr_tpu.viz.raster import render_overflow_probe
    probe = render_overflow_probe(verts, cam_trans, det, faces, size=128,
                                  focal=120.0)
    assert int(probe[1]) > 0, "scene must actually overflow the bin capacity"
    rgba_p = render_hands(verts, cam_trans, det, faces, backend="pallas",
                          interpret=True, **kw)
    rgba_s = render_hands(verts, cam_trans, det, faces, backend="scan", **kw)
    np.testing.assert_allclose(np.asarray(rgba_p), np.asarray(rgba_s),
                               atol=1e-5)


def test_render_overflow_probe(rng):
    # the app-facing probe: same geometry prep as render_hands, counts
    # against the capacity the binned kernel would use at this size
    from acr_tpu.viz.raster import render_overflow_probe
    verts = jnp.asarray(rng.randn(2, 778, 3).astype(np.float32) * 0.02)
    cam_trans = jnp.asarray(np.array([[0.0, 0.0, 0.6], [0.0, 0.0, 0.6]],
                                     np.float32))
    faces = jnp.asarray(
        rng.randint(0, 778, (2, 1538, 3)).astype(np.int32))
    det = jnp.array([True, True])
    probe = render_overflow_probe(verts, cam_trans, det, faces,
                                  size=512)
    assert probe.shape == (4,)
    mx, n_over, mx_band, n_band = [int(x) for x in probe]
    # a dense random 1538-face blob at the image center easily exceeds
    # the 512-face tile capacity -> the probe must SEE that
    assert mx > 0
    assert n_over >= 0
    # below 1024px the banded kernel is not in the dispatch: band
    # fields must be 0 so the host never warns about a capacity that
    # cannot trigger at this size
    assert mx_band == 0 and n_band == 0
    # undetected hands contribute no live faces
    probe0 = render_overflow_probe(verts, cam_trans,
                                   jnp.array([False, False]), faces,
                                   size=512)
    assert int(probe0[0]) == 0 and int(probe0[1]) == 0


def test_render_overflow_probe_sees_band_overflow(rng):
    """A band-concentrated scene at >=1024px: every tile under the
    tile cap but one 256px row band above BAND_CAP makes render_hands
    take the flat fallback — the probe must report it (it was blind to
    this regime when it only counted tiles; r5 review finding)."""
    from acr_tpu.viz.raster import render_overflow_probe
    from acr_tpu.viz.raster_pallas import BAND_CAP, BIN_CAP
    n_verts = 778
    # verts walk a serpentine grid inside ONE 256px row band (y extent
    # ~80px, x the full width); faces join CONSECUTIVE verts, so every
    # face is a tiny local triangle hitting only 1-4 tiles
    cols = 56
    i = np.arange(n_verts)
    xs = (-0.45 + 0.90 * (i % cols) / (cols - 1)).astype(np.float32)
    # zigzag keeps consecutive triples non-collinear (live area)
    ys = (0.30 + 0.08 * (i // cols) / (n_verts // cols)
          + 0.002 * (i % 2)).astype(np.float32)
    verts = jnp.asarray(np.stack(
        [xs, ys, np.zeros(n_verts, np.float32)], axis=1))[None]
    verts = jnp.concatenate([verts, verts], axis=0)       # both hands
    cam_trans = jnp.asarray(np.array([[0.0, 0.0, 1.0],
                                      [0.0, 0.0, 1.0]], np.float32))
    f = np.arange(1538) % (n_verts - 2)
    faces_np = np.stack([f, f + 1, f + 2], axis=1).astype(np.int32)
    faces = jnp.asarray(np.stack([faces_np, faces_np], axis=0))
    det = jnp.array([True, True])
    probe = render_overflow_probe(verts, cam_trans, det, faces,
                                  size=1024, focal=1000.0)
    mx, n_over, mx_band, n_band = [int(x) for x in probe]
    # 2x1538 live faces all inside one band: above BAND_CAP
    assert mx_band > BAND_CAP and n_band >= 1, (mx, n_over, mx_band,
                                                n_band)
    # ...while no tile exceeds the tile capacity
    assert mx <= BIN_CAP and n_over == 0, (mx, n_over)


def test_bin_faces_prestage_2048_shapes(rng):
    # prestage scales to the 2048px tiling (pure JAX, no kernel run)
    screen, faces = make_geometry(rng, n_pts=400)
    screen = screen.at[:, :2].mul(16.0)          # spread over 2048px
    f_total = faces.shape[0]
    tri = screen[faces].transpose(1, 2, 0).reshape(9, f_total)
    tri = jnp.concatenate([tri, jnp.zeros((7, f_total))], axis=0)
    xs, ys = tri[jnp.array([0, 3, 6])], tri[jnp.array([1, 4, 7])]
    area = ((tri[3] - tri[0]) * (tri[7] - tri[1])
            - (tri[6] - tri[0]) * (tri[4] - tri[1]))
    inv = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)[None, :]
    cap = FACE_CHUNK
    tri_t, inv_t, ids_t, counts = _bin_faces(tri, inv, 2048, 2048, 256, cap)
    n_tiles = (2048 // 8) * (2048 // 256)
    assert tri_t.shape == (n_tiles, 16, cap)
    assert ids_t.shape == (n_tiles, 1, cap)
    ids = np.asarray(ids_t)[:, 0, :]
    # per-tile counts drive the kernel's dynamic chunk bound: they must
    # equal each tile's live-slot count (clipped to cap)
    np.testing.assert_array_equal(
        np.asarray(counts), np.count_nonzero(ids >= 0, axis=1))
    # live slots carry real ids in ascending order; dead slots are -1
    live = ids >= 0
    assert (np.asarray(inv_t)[:, 0, :][~live] == 0).all()
    for row in ids[np.count_nonzero(live, 1) > 1][:16]:
        r = row[row >= 0]
        assert (np.diff(r) > 0).all()            # id order preserved
    # every live face appears in at least one tile
    assert set(np.unique(ids[live])) >= set(
        np.asarray(jnp.nonzero(inv[0] != 0)[0]).tolist())


def test_render_hands_2048_e2e_scan(rng):
    """End-to-end 2048px render (scan backend, CPU-sized mesh)."""
    half = 0.2
    quad = np.array([[-half, -half, 0], [half, -half, 0],
                     [half, half, 0], [-half, half, 0]], np.float32)
    verts = jnp.asarray(np.stack([quad, quad + [0.0, 0.0, 0.5]]))
    faces = jnp.asarray(
        np.tile(np.array([[0, 1, 2], [0, 2, 3]], np.int32), (2, 1, 1)))
    rgba = render_hands(verts,
                        jnp.asarray(np.tile([0.0, 0.0, 2.0], (2, 1)),
                                    jnp.float32),
                        jnp.array([True, True]), faces,
                        size=2048, focal=1265.0 * 4, backend="scan")
    rgba = np.asarray(rgba)
    assert rgba.shape == (2048, 2048, 4)
    ys, xs = np.nonzero(rgba[..., 3] > 0)
    assert xs.mean() == pytest.approx(1024, abs=4)
    assert ys.mean() == pytest.approx(1024, abs=4)
    # footprint ~ 2*half*focal/z = 0.4*5060/2 = 1012px wide
    assert 900 < (xs.max() - xs.min()) < 1100


def test_render_hands_scan_backend_unchanged(rng):
    # the 'scan' backend remains selectable and is what CPU 'auto' uses
    verts = jnp.asarray(rng.randn(2, 778, 3).astype(np.float32) * 0.03)
    faces = jnp.asarray(rng.randint(0, 778, (2, 1538, 3)).astype(np.int32))
    trans = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    det = jnp.asarray([True, True])
    a = render_hands(verts, trans, det, faces, size=128, focal=200.0,
                     backend="scan")
    b = render_hands(verts, trans, det, faces, size=128, focal=200.0,
                     backend="auto")      # cpu -> scan
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


# ---------------------------------------------------------------------------
# in-kernel winner-attribute pick (the MXU one-hot fold that replaces
# shade()'s per-pixel gathers)
# ---------------------------------------------------------------------------

def _random_attrs(rng, f_total):
    from acr_tpu.viz.raster_pallas import N_ATTR
    return jnp.asarray(rng.randn(N_ATTR, f_total).astype(np.float32))


def test_attr_pick_matches_gather_flat(rng):
    screen, faces = make_geometry(rng)
    attrs = _random_attrs(rng, faces.shape[0])
    fid0, bary0 = rasterize_pallas(screen, faces, 128, 128, interpret=True)
    fid1, bary1, attr_img = rasterize_pallas(screen, faces, 128, 128,
                                             interpret=True, attrs=attrs)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    # with attrs, bary is PLANAR (3, H, W) — same values, device layout
    np.testing.assert_array_equal(np.asarray(bary0),
                                  np.moveaxis(np.asarray(bary1), 0, -1))
    fid = np.asarray(fid1)
    at = np.asarray(attrs)
    # covered pixels: bit-identical to a host gather of the winner's
    # rows; contract is PLANAR (N_ATTR, H, W) — see _attr_planes
    expect = np.where((fid >= 0)[..., None],
                      at.T[np.maximum(fid, 0)], 0.0).transpose(2, 0, 1)
    np.testing.assert_array_equal(np.asarray(attr_img), expect)


def test_attr_pick_matches_gather_binned(rng):
    s1, f1 = make_geometry(rng, n_pts=300)
    s2, f2 = make_geometry(rng, n_pts=300)
    s1 = s1.at[:, 0].add(-30.0)
    s2 = s2.at[:, 0].add(30.0)
    screen = jnp.concatenate([s1, s2])
    faces = jnp.concatenate([f1, f2 + s1.shape[0]])
    attrs = _random_attrs(rng, faces.shape[0])
    fid0, bary0 = rasterize_pallas_binned(screen, faces, 128, 128,
                                          bin_cap=128, interpret=True)
    fid1, bary1, attr_img = rasterize_pallas_binned(
        screen, faces, 128, 128, bin_cap=128, interpret=True, attrs=attrs)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    # with attrs, bary is PLANAR (3, H, W) — same values, device layout
    np.testing.assert_array_equal(np.asarray(bary0),
                                  np.moveaxis(np.asarray(bary1), 0, -1))
    fid = np.asarray(fid1)
    at = np.asarray(attrs)
    expect = np.where((fid >= 0)[..., None],
                      at.T[np.maximum(fid, 0)], 0.0).transpose(2, 0, 1)
    np.testing.assert_array_equal(np.asarray(attr_img), expect)


def test_shade_from_attrs_equals_shade(rng):
    """render_hands(pallas) == render_hands(scan) with the new
    shade_from_attrs path — exact, including background alpha=0."""
    verts = jnp.asarray(rng.randn(2, 778, 3).astype(np.float32) * 0.03)
    faces = jnp.asarray(rng.randint(0, 778, (2, 1538, 3)).astype(np.int32))
    trans = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    det = jnp.asarray([True, True])
    a = render_hands(verts, trans, det, faces, size=128, focal=200.0,
                     backend="pallas", interpret=True)
    b = render_hands(verts, trans, det, faces, size=128, focal=200.0,
                     backend="scan")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_adaptive_capacity_tier_matches_scan(rng):
    """A sparse scene (low max tile overlap) rides a SMALL capacity
    tier through the lax.switch in render_hands; output must still be
    exactly the scan render. (Dense scenes covering the flat tier are
    tested in test_render_hands_overflow_falls_back_exact.)"""
    from acr_tpu.viz.raster import render_hands, render_overflow_probe
    half = 0.02
    quad = np.array([[-half, -half, 0], [half, -half, 0],
                     [half, half, 0], [-half, half, 0]], np.float32)
    # two tiny quads far apart -> few faces per tile
    verts = jnp.asarray(np.stack([quad + [-0.15, 0, 0], quad + [0.15, 0, 0]]))
    faces_quad = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # pad the face list so f_total exceeds the smallest tier and the
    # binned path (not the small-mesh flat shortcut) is taken
    faces = jnp.asarray(np.tile(np.concatenate(
        [faces_quad, np.zeros((158, 3), np.int32)]), (2, 1, 1)))
    trans = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    det = jnp.asarray([True, True])
    probe = render_overflow_probe(verts, trans, det, faces, size=256,
                                   focal=400.0)
    assert 0 < int(probe[0]) <= 128    # scene really selects tier 0
    a = render_hands(verts, trans, det, faces, size=256, focal=400.0,
                     backend="pallas", interpret=True)
    b = render_hands(verts, trans, det, faces, size=256, focal=400.0,
                     backend="scan")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_high_res_keeps_full_capacity_tier():
    """The 512 capacity tier must stay available ABOVE 1024px.

    bin_cap_for used to halve to 256 above 1024px on the assumption
    that high-res tiles see fewer faces — measured false on the bench
    realistic close-up scene (max 377 bbox-overlap faces/tile at 512,
    1024 AND 2048 px): the halved cap pushed every 2048px frame onto
    the ~277 ms flat fallback (fused stream step 331.8 ms). Adaptive
    tier selection already handles sparse frames; the tier LIST must
    not shrink with resolution. Pins: (a) bin_cap_for is BIN_CAP at
    every size, (b) a scene with 256 < max faces/tile <= 512 shows
    ZERO overflowing tiles at 2048px via the app-facing probe (i.e.
    it rides a binned tier, not the flat fallback)."""
    from acr_tpu.viz.raster import render_overflow_probe
    from acr_tpu.viz.raster_pallas import BIN_CAP, bin_cap_for

    for size in (256, 512, 1024, 2048, 4096):
        assert bin_cap_for(size) == BIN_CAP
    # 300 coincident stacked triangles on hand 0 -> one tile sees 300
    # faces (between tier 256 and tier 512); hand 1 undetected
    verts = np.zeros((2, 778, 3), np.float32)
    verts[0, 0] = [-0.01, -0.01, 0.0]
    verts[0, 1] = [0.01, -0.01, 0.0]
    verts[0, 2] = [0.0, 0.01, 0.0]
    faces = np.tile(np.array([[0, 1, 2]], np.int32), (300, 1))
    faces = np.stack([faces, faces])                      # (2, 300, 3)
    trans = jnp.asarray([[0, 0, 0.6], [0, 0, 0.6]], jnp.float32)
    det = jnp.asarray([True, False])
    probe = render_overflow_probe(
        jnp.asarray(verts), trans, det, jnp.asarray(faces), size=2048)
    assert 256 < int(probe[0]) <= 512, int(probe[0])
    assert int(probe[1]) == 0
