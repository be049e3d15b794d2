"""Latency-optimized streaming loop: double-buffered host <-> device overlap.

The reference webcam mode runs the full per-frame stack synchronously —
capture, preprocess, GPU forward, host smoothing, render, display — so
frame latency is the *sum* of every stage (reference: acr/main.py:196-202,
SURVEY.md §3.5). Here the loop is pipelined around JAX's asynchronous
dispatch:

    frame k:   [device compute .........]
    frame k+1:         [capture+preprocess] [dispatch]
    frame k-1: [render+display on host]

While the device runs frame k, the host preprocesses frame k+1 (the
next ``device_put`` lands in HBM before compute needs it — the
host->HBM double buffer) and renders/displays frame k-1's result.
Temporal smoothing state stays on device between frames.

A ``FrameSource`` is anything with ``read() -> Optional[ndarray]``
(WebcamVideoStream, OpenCVCapture, or the synthetic source used in
tests), so the pipeline is testable without a camera.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Protocol

import numpy as np

from acr_tpu.utils.meters import AverageMeter


class FrameSource(Protocol):
    def read(self) -> Optional[np.ndarray]: ...


class SyntheticSource:
    """Deterministic fake camera for pipeline tests (SURVEY.md §4 d)."""

    def __init__(self, n_frames: int, height: int = 96, width: int = 128,
                 seed: int = 0):
        rng = np.random.RandomState(seed)
        self.frames = [
            (rng.rand(height, width, 3) * 255).astype(np.uint8)
            for _ in range(n_frames)]
        self.idx = 0

    def read(self) -> Optional[np.ndarray]:
        if self.idx >= len(self.frames):
            return None
        frame = self.frames[self.idx]
        self.idx += 1
        return frame


class StreamingLoop:
    """Drives an ACRApp-style per-frame stack with one frame in flight."""

    def __init__(self, app, on_result: Optional[Callable] = None,
                 max_frames: Optional[int] = None):
        self.app = app
        self.on_result = on_result
        self.max_frames = max_frames
        self.latency = AverageMeter()
        self.latencies = []

    def run(self, source: FrameSource) -> int:
        """Pipelined loop; returns number of frames processed."""
        from acr_tpu.pipeline.preprocess import img_preprocess
        import jax

        app, cfg = self.app, self.app.cfg
        inflight = None          # (t_start, frame, meta, out)
        count = 0
        while self.max_frames is None or count < self.max_frames:
            frame = source.read()
            if frame is None:
                break
            t0 = time.perf_counter()
            meta = img_preprocess(frame, str(count), input_size=cfg.input_size)
            if app._jit_stream_step is not None:
                # ONE fused async dispatch (forward + OneEuro + refine
                # + render, app._jit_stream_step): the unfused
                # per-stage dispatches cost 4-5 relay round trips/frame
                out = app.stream_step(meta)
            else:
                # legacy per-stage dispatches — the data-parallel path,
                # where the pipeline handles mesh sharding/padding
                out = app.pipeline(meta["image"], meta["offsets"])
                if cfg.temporal_optimization:
                    app.filter_state, poses, betas = app._smooth(
                        app.filter_state, out["poses"][0], out["betas"][0],
                        out["detection_flag"][0])
                    out["poses"], out["betas"] = poses[None], betas[None]
                    out.update(app.pipeline.refine(
                        out["poses"], out["betas"], out["cam"],
                        meta["offsets"]))
                if app.visualizer is not None and cfg.renderer == "tpu":
                    out["_rgba"] = app.visualizer.render_rgba_device(out)

            if inflight is not None:
                self._finish(*inflight)
            inflight = (t0, frame, meta, out)
            count += 1
        if inflight is not None:
            self._finish(*inflight)
        return count

    def _finish(self, t0, frame, meta, out):
        """Single packed readback, then host render/deliver + latency."""
        if isinstance(out, dict):          # legacy (data-parallel) path
            import jax
            out = jax.device_get(out)
            # legacy path took _rgba straight from render_rgba_device,
            # which emits planar (4, S, S)
            rgba_planar = True
        else:
            out = self.app.unpack_stream(out)  # ONE array = one round trip
            rgba_planar = False            # unpack restores (S, S, 4)
        detected = np.asarray(out["detection_flag"])
        rendered = frame
        if detected.any() and self.app.visualizer is not None:
            if "_rgba" in out:
                rendered = self.app.visualizer.compose_on_frame(
                    out["_rgba"], frame, meta, planar=rgba_planar)
            else:
                rendered = self.app.visualizer.render_on_frame(frame, out, meta)
        dt = (time.perf_counter() - t0) * 1000.0
        self.latency.update(dt)
        self.latencies.append(dt)
        if self.on_result is not None:
            self.on_result(rendered, out)

    def p50_latency_ms(self) -> float:
        return float(np.percentile(self.latencies, 50)) if self.latencies else 0.0
