"""Visualization: mesh compositing, paste-back, keypoints, heatmaps.

Host-side orchestration around the on-device rasterizer
(acr_tpu/viz/raster.py). Mirrors the reference Visualizer's behaviour
(reference: acr/visualization.py:18-300): alpha-blend the rendered mesh
over the 512px network input (visible weight 0.9), then paste the
square render back into the original frame through the inverse of the
pad/crop offsets ('put_org', visualization.py:196-220) including the
4x-upscale path for render_size > 1000. Keypoint skeletons and
center-heatmap overlays mirror the aux views.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.viz.raster import render_hands

# MANO 21-joint output order (models/mano.py REORDER_21): wrist, then
# thumb/index/middle/ring/pinky chains base->tip.
_FINGERS = ("thumb", "index", "middle", "ring", "pinky")
# InterHand drawing order maps fingertips first (reference:
# acr/visualization.py:25)
MANO2INTERHAND = np.array([4, 3, 2, 1, 8, 7, 6, 5, 12, 11, 10, 9,
                           16, 15, 14, 13, 20, 19, 18, 17, 0])


def hand_skeleton():
    """InterHand-style 21-joint skeleton: (name, parent_id) list.

    Chains of 4 per finger, tips at indices 4k, wrist last (the layout
    of the reference's mano/skeleton.txt, regenerated procedurally).
    """
    skeleton = []
    for f_idx, finger in enumerate(_FINGERS):
        for level in range(4):            # 4 = tip ... 1 = base
            joint_id = f_idx * 4 + level
            parent = joint_id + 1 if level < 3 else 20
            skeleton.append({"name": f"{finger}{4 - level}",
                             "parent_id": parent})
    skeleton.append({"name": "wrist", "parent_id": -1})
    return skeleton


_FINGER_RGB = {
    "thumb": (255, 0, 0), "index": (0, 255, 0), "middle": (255, 128, 0),
    "ring": (0, 128, 255), "pinky": (255, 0, 255), "wrist": (230, 230, 0),
}


def _joint_color(name: str):
    for finger, rgb in _FINGER_RGB.items():
        if name.startswith(finger):
            return rgb
    return (230, 230, 0)


class Visualizer:
    """Owns MANO faces + jitted renderer; all composition in numpy."""

    def __init__(self, cfg: Config, faces: np.ndarray):
        self.cfg = cfg
        self.faces = jnp.asarray(faces.astype(np.int32))   # (2, 1538, 3)
        self.skeleton = hand_skeleton()
        # resolve the projection once: 'pt3d' mirrors the pytorch3d
        # backend's rule — FoVPerspective when perspective_proj else
        # FoVOrthographic (reference: renderer_pt3d.py:74-110)
        cm = cfg.camera_model
        if cm == "pt3d":
            cm = "fov" if cfg.perspective_proj else "ortho"
        self.camera = cm
        if cfg.renderer == "native" and cm != "intrinsics":
            raise ValueError(
                "the native C++ rasterizer implements the intrinsics "
                f"camera only; camera_model={cfg.camera_model!r} needs "
                "renderer='tpu'")

    # ------------------------------------------------------------------
    def render_rgba(self, out: Dict, batch_idx: int = 0) -> np.ndarray:
        """Rasterize both hands of one image -> (S, S, 4) float RGBA.

        Backend per config: 'tpu' = on-device JAX rasterizer (default);
        'native' = host C++ z-buffer (native/acr_native.cpp), the
        counterpart of the reference's pyrender/pytorch3d backends.
        """
        if self.cfg.renderer == "native":
            return self._render_native(out, batch_idx)
        rgba = render_hands(
            out["verts"][batch_idx], out["cam_trans"][batch_idx],
            out["detection_flag"][batch_idx], self.faces,
            size=self.cfg.render_size, focal=float(self.cfg.focal_length),
            camera=self.camera, fov_deg=float(self.cfg.FOV))
        return np.asarray(rgba)

    def _render_native(self, out: Dict, batch_idx: int) -> np.ndarray:
        from acr_tpu.io.native import rasterize
        from acr_tpu.viz.raster import PRE_COLORS
        det = np.asarray(out["detection_flag"][batch_idx])
        verts = (np.asarray(out["verts"][batch_idx])
                 + np.asarray(out["cam_trans"][batch_idx])[:, None, :])
        faces_np = np.asarray(self.faces)
        all_verts, all_faces, all_colors = [], [], []
        offset = 0
        for hand in range(2):
            if not det[hand]:
                continue
            all_verts.append(verts[hand])
            all_faces.append(faces_np[hand] + offset)
            all_colors.append(np.tile(PRE_COLORS[hand], (faces_np.shape[1], 1)))
            offset += verts.shape[1]
        if not all_verts:
            return np.zeros((self.cfg.render_size, self.cfg.render_size, 4),
                            np.float32)
        return rasterize(np.concatenate(all_verts),
                         np.concatenate(all_faces),
                         np.concatenate(all_colors),
                         size=self.cfg.render_size,
                         focal=float(self.cfg.focal_length))

    def composite(self, rgba: np.ndarray, input_rgb: np.ndarray) -> np.ndarray:
        """Blend render over the (resized) network input; uint8 RGB."""
        import cv2
        s = rgba.shape[0]
        if input_rgb.shape[0] != s:
            input_rgb = cv2.resize(input_rgb, (s, s),
                                   interpolation=cv2.INTER_LINEAR)
        render = rgba[..., :3] * 255.0
        alpha = (rgba[..., 3:] > 0).astype(np.float32)
        blended = (render * alpha * 0.9 + input_rgb * alpha * 0.1
                   + (1 - alpha) * input_rgb)
        return blended.astype(np.uint8)

    def paste_back(self, rendered: np.ndarray, frame_rgb: np.ndarray,
                   offsets: np.ndarray) -> np.ndarray:
        """'put_org': place the square render into the original frame."""
        import cv2
        offsets = offsets.astype(np.int64)
        (ph, pw) = offsets[:2]
        ct, cr, cb, cl = offsets[2:6]
        pt, pr, pb, pl = offsets[6:10]
        org = frame_rgb.copy()
        ih, iw = org.shape[:2]
        if self.cfg.render_size > 1000:
            ih, iw, ph, pw = ih * 4, iw * 4, ph * 4, pw * 4
            ct, cr, cb, cl = ct * 4, cr * 4, cb * 4, cl * 4
            pt, pr, pb, pl = pt * 4, pr * 4, pb * 4, pl * 4
            org = cv2.resize(org, (iw, ih), interpolation=cv2.INTER_LINEAR)
        resized = cv2.resize(rendered, (int(pw) + 1, int(ph) + 1),
                             interpolation=cv2.INTER_CUBIC)
        org[ct:ih - cb, cl:iw - cr] = resized[pt:ph - pb, pl:pw - pr]
        return org

    def render_rgba_device(self, out: Dict, batch_idx: int = 0):
        """Dispatch the on-device render WITHOUT synchronizing.

        Returns the device array so callers can batch the readback with
        the rest of the frame's outputs (one host<->device round trip
        per frame instead of one per array). PLANAR (4, S, S) layout:
        the downstream jitted uint8 pack then runs at full TPU lane
        occupancy (see raster.shade_from_attrs); host consumers
        normalize via compose_on_frame / unpack_outputs.
        """
        return render_hands(
            out["verts"][batch_idx], out["cam_trans"][batch_idx],
            out["detection_flag"][batch_idx], self.faces,
            size=self.cfg.render_size, focal=float(self.cfg.focal_length),
            camera=self.camera, fov_deg=float(self.cfg.FOV), planar=True)

    def overflow_probe_device(self, out: Dict, batch_idx: int = 0):
        """Dispatch the rasterizer capacity probe (no sync).

        Returns ONE (4,) int32 device vector [max_faces_per_tile,
        n_overflowing_tiles, max_faces_per_band, n_overflowing_bands]
        to ride the frame's single readback; see
        raster.render_overflow_probe."""
        from acr_tpu.viz.raster import render_overflow_probe
        return render_overflow_probe(
            out["verts"][batch_idx], out["cam_trans"][batch_idx],
            out["detection_flag"][batch_idx], self.faces,
            size=self.cfg.render_size, focal=float(self.cfg.focal_length),
            camera=self.camera, fov_deg=float(self.cfg.FOV))

    def compose_on_frame(self, rgba: np.ndarray, bgr_frame: np.ndarray,
                         meta: Dict,
                         planar: Optional[bool] = None) -> np.ndarray:
        """Host-side compositing + paste-back; returns BGR.

        Accepts (S, S, 4) or the device-planar (4, S, S) form that
        render_rgba_device emits (normalized here with a free numpy
        moveaxis). ``planar`` states the layout explicitly — every
        in-repo caller knows which render path produced ``rgba``;
        ``None`` falls back to shape inference, which is ambiguous for
        a 4px render (ADVICE r4)."""
        rgba = np.asarray(rgba)
        if planar is None:
            planar = (rgba.ndim == 3 and rgba.shape[0] == 4
                      and rgba.shape[-1] != 4)
        if planar:
            rgba = np.moveaxis(rgba, 0, -1)
        input_rgb = np.asarray(meta["image"][0])
        blended = self.composite(rgba, input_rgb)
        pasted = self.paste_back(blended, bgr_frame[:, :, ::-1],
                                 meta["offsets"][0])
        return pasted[:, :, ::-1]

    def render_on_frame(self, bgr_frame: np.ndarray, out: Dict,
                        meta: Dict) -> np.ndarray:
        """Full mesh-over-frame path; returns BGR for cv2.imwrite."""
        rgba = self.render_rgba(out)
        return self.compose_on_frame(rgba, bgr_frame, meta, planar=False)

    # ------------------------------------------------------------------
    def draw_keypoints(self, image_rgb: np.ndarray, kp2d: np.ndarray,
                       line_width: int = 3, radius: int = 3) -> np.ndarray:
        """Draw one hand's 21 projected joints + bones (PIL, uint8 RGB)."""
        from PIL import Image, ImageDraw
        kps = kp2d[MANO2INTERHAND]
        img = Image.fromarray(image_rgb.astype(np.uint8))
        draw = ImageDraw.Draw(img)
        for i, joint in enumerate(self.skeleton):
            pid = joint["parent_id"]
            color = _joint_color(joint["name"])
            if pid != -1:
                parent_color = _joint_color(self.skeleton[pid]["name"])
                draw.line([tuple(kps[i]), tuple(kps[pid])],
                          fill=parent_color, width=line_width)
            draw.ellipse((kps[i][0] - radius, kps[i][1] - radius,
                          kps[i][0] + radius, kps[i][1] + radius), fill=color)
        return np.asarray(img)

    def aux_views(self, out: Dict, meta: Dict,
                  items: Sequence[str]) -> Dict[str, np.ndarray]:
        """Auxiliary visualizations per show_items (reference:
        acr/visualization.py:174-254 'org_img'/'pj2d'/'centermap'/'j3d').
        Returns {item_name: uint8 RGB image}."""
        views: Dict[str, np.ndarray] = {}
        input_rgb = np.asarray(meta["image"][0])
        det = np.asarray(out["detection_flag"])[0]
        for item in items:
            if item == "org_img":
                views["org_img"] = input_rgb
            elif item == "pj2d":
                img = input_rgb.copy()
                pj2d_px = (np.asarray(out["pj2d"])[0] + 1) / 2 * input_rgb.shape[0]
                for hand in range(2):
                    if det[hand]:
                        img = self.draw_keypoints(img, pj2d_px[hand])
                views["pj2d"] = np.asarray(img)
            elif item == "centermap" and "l_center_map" in out:
                l = self.make_heatmap_overlay(input_rgb,
                                              np.asarray(out["l_center_map"])[0])
                r = self.make_heatmap_overlay(input_rgb,
                                              np.asarray(out["r_center_map"])[0])
                views["centermap"] = np.concatenate([l, r], axis=1)
            elif item == "j3d":
                from acr_tpu.viz.skeleton3d import Plotter3dPoses
                plotter = Plotter3dPoses(
                    canvas_size=input_rgb.shape[:2])
                poses = [np.asarray(out["j3d"])[0, h] for h in range(2)
                         if det[h]]
                colors = [(255, 0, 0), (0, 255, 255)]
                views["j3d"] = plotter.encircle_plot(poses, colors[:len(poses)])
        return views

    def make_heatmap_overlay(self, image_rgb: np.ndarray,
                             heatmap: np.ndarray) -> np.ndarray:
        """JET-colormap center-heatmap over the image (reference:
        acr/visualization.py:280-300)."""
        import cv2
        h = np.asarray(heatmap)
        if h.ndim == 3:
            h = h[..., 0]
        h = cv2.resize(h, image_rgb.shape[:2][::-1])
        h8 = np.clip(h * 255, 0, 255).astype(np.uint8)
        colored = cv2.applyColorMap(h8, cv2.COLORMAP_JET)[:, :, ::-1]
        return (colored * 0.7 + image_rgb * 0.3).astype(np.uint8)
