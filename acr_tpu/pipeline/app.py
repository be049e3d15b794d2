"""Application driver: per-frame orchestration + the four demo modes.

TPU-native counterpart of the reference app-level ACR class and
``main()`` dispatch (reference: acr/main.py:24-205). Differences by
design:

* the model/parser/MANO/projection chain is one jitted call
  (pipeline.infer), not a Python pipeline with per-stage syncs;
* OneEuro smoothing state is a device-side pytree; smoothing + MANO
  re-run is a second small jitted call instead of host math;
* the image demo mode reads ``--inputs`` (the reference's image mode
  references an undefined variable and crashes, acr/main.py:158 — a
  quirk we fix rather than replicate).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np

import jax

from acr_tpu.config import Config
from acr_tpu.io.writers import (
    collect_image_list,
    save_results,
    save_video,
    split_frame,
)
from acr_tpu.pipeline.capture import WebcamVideoStream
from acr_tpu.pipeline.infer import ACRPipeline
from acr_tpu.pipeline.preprocess import img_preprocess
from acr_tpu.pipeline.results import reorganize_results
from acr_tpu.pipeline.temporal import init_two_hand_filter, smooth_two_hands

log = logging.getLogger("acr_tpu")


class ACRApp:
    """Owns the pipeline, visualizer, temporal state, and output dirs."""

    def __init__(self, cfg: Config, params=None):
        self.cfg = cfg
        self.pipeline = ACRPipeline(cfg, params=params)
        self.visualizer = None
        if cfg.save_visualization_on_img and cfg.renderer != "none":
            from acr_tpu.viz.visualizer import Visualizer
            self.visualizer = Visualizer(cfg, self.pipeline.faces)
        self.filter_state = init_two_hand_filter()
        self._smooth = jax.jit(
            lambda st, p, b, d: smooth_two_hands(
                st, p, b, d, cfg.smooth_coeff))
        self.output_dir = cfg.output_dir or "./demos_outputs/"

    # ------------------------------------------------------------------
    def process_frame(self, bgr_frame: np.ndarray, path: str
                      ) -> Dict[str, list]:
        """Full per-frame stack; returns reference-format results dict."""
        meta = img_preprocess(bgr_frame, path, input_size=self.cfg.input_size)
        out = self.pipeline(meta["image"], meta["offsets"])
        detected = np.asarray(out["detection_flag"])

        if not detected.any():
            log.info("no hand detected: %s", path)
            self._emit_frame(bgr_frame, path)
            return {path: []}

        if self.cfg.temporal_optimization:
            self.filter_state, poses, betas = self._smooth(
                self.filter_state, out["poses"][0], out["betas"][0],
                out["detection_flag"][0])
            out["poses"] = poses[None]
            out["betas"] = betas[None]
            out.update(self.pipeline.refine(out["poses"], out["betas"],
                                            out["cam"], meta["offsets"]))

        results = reorganize_results(out, [path])
        if self.visualizer is not None:
            rendered = self.visualizer.render_on_frame(bgr_frame, out, meta)
            self._emit_frame(rendered, path)
        else:
            self._emit_frame(bgr_frame, path)
        return results

    def _emit_frame(self, bgr_frame: np.ndarray, path: str):
        if self.cfg.demo_mode == "webcam" or not self.cfg.save_visualization_on_img:
            if self.cfg.interactive_vis:
                import cv2
                cv2.imshow("acr_tpu", bgr_frame)
                cv2.waitKey(1)
            return
        os.makedirs(self.output_dir, exist_ok=True)
        import cv2
        cv2.imwrite(os.path.join(self.output_dir, os.path.basename(path)),
                    bgr_frame)

    # ------------------------------------------------------------------
    def run_image(self) -> Dict:
        imgpath = self.cfg.inputs
        if not imgpath or not os.path.exists(imgpath):
            raise FileNotFoundError(f"--inputs image not found: {imgpath}")
        self.output_dir = self.cfg.output_dir or \
            "./demos_outputs/single_images_output/"
        import cv2
        image = cv2.imread(imgpath)
        results = self.process_frame(image, imgpath)
        if self.cfg.save_dict_results:
            save_results(imgpath, self.output_dir, results)
        return results

    def run_folder(self) -> Dict:
        inputs = self.cfg.inputs
        if os.path.isdir(inputs):
            image_folder = inputs.rstrip("/")
        else:
            image_folder = split_frame(inputs)          # video file -> frames
        self.output_dir = self.cfg.output_dir or (
            "./demos_outputs/" + os.path.basename(image_folder) +
            f"_results_{self.cfg.centermap_conf_thresh}/")
        file_list = collect_image_list(image_folder)
        log.info("running on %d frames from %s", len(file_list), image_folder)
        import cv2
        results: Dict = {}
        t0 = time.time()
        for imgpath in file_list:
            results.update(self.process_frame(cv2.imread(imgpath), imgpath))
        dt = time.time() - t0
        if file_list:
            log.info("%d frames in %.2fs (%.2f FPS)",
                     len(file_list), dt, len(file_list) / dt)
        if self.cfg.save_visualization_on_img and self.visualizer is not None:
            save_video(self.output_dir,
                       os.path.join(self.output_dir,
                                    os.path.basename(image_folder) + "_output"))
        if self.cfg.save_dict_results:
            save_results(image_folder, self.output_dir, results)
        return results

    run_video = run_folder    # video mode = split to frames, then folder mode

    def run_webcam(self):
        cap = WebcamVideoStream(self.cfg.cam_id).start()
        try:
            while True:
                frame = cap.read()
                if frame is None:
                    break
                self.process_frame(frame, "0")
        finally:
            cap.stop()

    def run(self) -> Optional[Dict]:
        mode = self.cfg.demo_mode
        if mode == "image":
            return self.run_image()
        if mode in ("video", "folder"):
            return self.run_folder()
        if mode == "webcam":
            return self.run_webcam()
        raise ValueError(f"unknown demo_mode: {mode}")
