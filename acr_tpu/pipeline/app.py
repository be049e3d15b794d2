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
from acr_tpu.pipeline.temporal import (
    init_two_hand_filter,
    smooth_sequence,
    smooth_two_hands,
)
from acr_tpu.utils.meters import StageTimer

log = logging.getLogger("acr_tpu")


def pack_outputs(out: Dict, spec_sink: list, planar_rgba: bool = True):
    """(traced) concat every output into ONE flat f32 buffer.

    Through a relayed transport each fetched array pays its own round
    trip (~15 arrays measured 250-480 ms/frame) and readback BANDWIDTH
    is the next wall (~20 MB/s measured), so `_rgba` images ship as
    uint8 bytes bitcast into the f32 stream (4 bytes/px instead of 16;
    display precision). The unpack spec is recorded at trace time into
    ``spec_sink`` (cleared first) for :func:`unpack_outputs`.

    ``planar_rgba`` states the `_rgba` layout EXPLICITLY: True = the
    planar (…, 4, H, W) form render_rgba_device emits, False =
    channel-minor (…, H, W, 4). Callers own the render call, so the
    layout is known where the flag is passed — inferring it from
    trailing dims would misroute a 4px render (ADVICE r4).
    """
    import jax.numpy as jnp
    parts = []
    spec_sink.clear()
    for k in sorted(out):
        v = out[k]
        if k == "_rgba":
            # PLANAR (…, 4, H, W) from render_rgba_device: the clip/
            # round/uint8 ops run with minor dim W (full 128-lane
            # occupancy) instead of a 4-lane channel-minor layout.
            assert v.shape[-3 if planar_rgba else -1] == 4, \
                (v.shape, planar_rgba)
            if planar_rgba:
                # build each pixel's RGBA word ARITHMETICALLY —
                # r | g<<8 | b<<16 | a<<24 — every op full-lane on the
                # W-minor layout. The uint8 (N, 4) -> f32 bitcast this
                # replaces lowered to a lane-padded relayout + shift-or
                # reduce over a minor dim of 4 (6.1 ms/frame at 2048px,
                # r5 profile: reshape.5285 + shift-left_reduce_fusion);
                # this form is three shifts/ors at HBM speed. Bonus:
                # the word's byte order IS little-endian RGBA, so the
                # host unpack is a direct (…, H, W, 4) byte view.
                v8 = jnp.clip(jnp.round(v * 255.0), 0, 255
                              ).astype(jnp.uint8)
                ch = [v8[..., i, :, :].astype(jnp.uint32)
                      for i in range(4)]
                words = (ch[0] | (ch[1] << 8) | (ch[2] << 16)
                         | (ch[3] << 24))
                spec_sink.append((k, v.shape, "u8rgba"))
                parts.append(jax.lax.bitcast_convert_type(
                    words, jnp.float32).reshape(-1))
                continue
            v8 = jnp.clip(jnp.round(v * 255.0), 0, 255
                          ).astype(jnp.uint8).reshape(-1, 4)
            spec_sink.append((k, v.shape, "u8x255"))
            parts.append(jax.lax.bitcast_convert_type(v8, jnp.float32))
            continue
        spec_sink.append((k, v.shape, v.dtype))
        parts.append(v.astype(jnp.float32).reshape(-1))
    return jnp.concatenate(parts)


def unpack_outputs(packed, spec) -> Dict:
    """Host-side unpack of :func:`pack_outputs`' single buffer."""
    arr = np.asarray(packed)                   # the one readback
    out, off = {}, 0
    for k, shape, dtype in spec:
        n = int(np.prod(shape))
        if dtype == "u8rgba":                  # planar-packed RGBA words
            # shape records the device-side PLANAR (…, 4, H, W) form;
            # each f32 word's little-endian bytes are one pixel's
            # r, g, b, a, so the byte view is already channel-minor
            n4 = n // 4
            cm = shape[:-3] + shape[-2:] + (4,)
            raw = arr[off:off + n4].view(np.uint8).reshape(cm)
            out[k] = raw.astype(np.float32) / 255.0
            off += n4
            continue
        if dtype == "u8x255":                  # bitcast uint8 image
            n4 = n // 4
            raw = arr[off:off + n4].view(np.uint8).reshape(shape)
            out[k] = raw.astype(np.float32) / 255.0
            off += n4
            continue
        out[k] = arr[off:off + n].reshape(shape).astype(dtype)
        off += n
    return out


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
        self.timer = StageTimer()
        self._frame_idx = 0

        # fused streaming step: forward + OneEuro + refine + render as
        # ONE jitted dispatch. The unfused path pays one relay dispatch
        # per stage (4-5/frame, ~300 ms/frame measured through this
        # terminal's relay); fused is one dispatch + the single
        # readback. Filter state is carried (not donated) device-side —
        # see the NOTE below the step definitions.
        import jax.numpy as jnp
        from acr_tpu.pipeline.infer import _mano_projection_tail, forward_fn
        pl = self.pipeline
        do_temporal = cfg.temporal_optimization
        do_render = self.visualizer is not None and cfg.renderer == "tpu"
        # capacity telemetry: when the probe is enabled it is computed in
        # EVERY fused step (cheap; rides the packed readback — a
        # per-N-frames probe would need two traced program variants);
        # the host only LOGS it every raster_overflow_every frames
        do_probe = do_render and cfg.raster_overflow_every > 0

        self._stream_spec = []
        self._chunk_spec = []

        def _stream_step(params, ml, mr, state, image, offsets):
            out = forward_fn(pl.net, params, ml, mr, image, offsets, cfg,
                             merge_params=pl.merge_params)
            if do_temporal:
                state, poses, betas = smooth_two_hands(
                    state, out["poses"][0], out["betas"][0],
                    out["detection_flag"][0], cfg.smooth_coeff)
                out["poses"], out["betas"] = poses[None], betas[None]
                out.update(_mano_projection_tail(
                    ml, mr, out["poses"], out["betas"], out["cam"],
                    offsets, cfg))
            if do_render:
                out["_rgba"] = self.visualizer.render_rgba_device(out)
                if do_probe:
                    out["_raster_overflow"] = \
                        self.visualizer.overflow_probe_device(out)
            return state, pack_outputs(out, self._stream_spec,
                                       planar_rgba=True)

        def _render_chunk(out):
            """Per-frame on-device render (+ per-frame probe counts) via
            lax.map — map keeps the binned-raster overflow lax.cond per
            frame (a vmap would select-execute BOTH raster kernels)."""
            from acr_tpu.viz.raster import render_hands
            out["_rgba"] = jax.lax.map(
                lambda vcd: render_hands(
                    vcd[0], vcd[1], vcd[2], self.pipeline.faces,
                    size=cfg.render_size,
                    focal=float(cfg.focal_length),
                    camera=self.visualizer.camera,
                    fov_deg=float(cfg.FOV), planar=True),
                (out["verts"], out["cam_trans"],
                 out["detection_flag"]))
            if do_probe:
                from acr_tpu.viz.raster import render_overflow_probe
                out["_probe_frames"] = jax.lax.map(
                    lambda vcd: render_overflow_probe(
                        vcd[0], vcd[1], vcd[2], self.pipeline.faces,
                        size=cfg.render_size,
                        focal=float(cfg.focal_length),
                        camera=self.visualizer.camera,
                        fov_deg=float(cfg.FOV)),
                    (out["verts"], out["cam_trans"],
                     out["detection_flag"]))       # (B, 4)
            return out

        def _probe_reduce(out):
            """Chunk telemetry: worst tile/band across frames + total
            overflowing tiles/bands in the chunk (host logging
            format; probe rows are [max_tile, n_tiles_over, max_band,
            n_bands_over], raster.render_overflow_probe)."""
            per_frame = out.pop("_probe_frames", None)
            if per_frame is not None:
                out["_raster_overflow"] = jnp.stack(
                    [per_frame[:, 0].max(), per_frame[:, 1].sum(),
                     per_frame[:, 2].max(), per_frame[:, 3].sum()])
            return out

        def _chunk_step(params, ml, mr, state, image, offsets):
            """Throughput twin of _stream_step: a whole frame chunk,
            scan-based OneEuro, per-frame on-device render, and one
            packed buffer out."""
            out = forward_fn(pl.net, params, ml, mr, image, offsets, cfg,
                             merge_params=pl.merge_params)
            if do_temporal:
                state, poses, betas = smooth_sequence(
                    state, out["poses"], out["betas"],
                    out["detection_flag"], cfg.smooth_coeff)
                out["poses"], out["betas"] = poses, betas
                out.update(_mano_projection_tail(
                    ml, mr, poses, betas, out["cam"], offsets, cfg))
            if do_render:
                out = _render_chunk(out)
            out = _probe_reduce(out)
            return state, pack_outputs(out, self._chunk_spec,
                                       planar_rgba=True)

        # NOTE: the filter state is NOT donated — its freshly-initialized
        # pytree aliases the same zero buffer across leaves, and XLA
        # rejects donating one buffer twice. The donated image/offsets
        # free their HBM at execution; they can never ALIAS the packed
        # f32 output (dtype/size mismatch), so XLA's "donated buffers
        # were not usable" note is expected (filtered in infer.py at
        # runtime and pyproject for pytest).
        self._jit_stream_step = None
        self._jit_chunk_step = None
        self._fused_bypass_reason = None
        if pl.mesh is None:
            self._jit_stream_step = jax.jit(_stream_step,
                                            donate_argnums=(4, 5))
            self._jit_chunk_step = jax.jit(_chunk_step,
                                           donate_argnums=(4, 5))
            return

        # Data-parallel mesh. The webcam STREAM step stays per-stage
        # (batch-1 sequential; a mesh cannot help one frame in flight).
        # The fused CHUNK step runs whenever frames are independent —
        # folder/video mode without -t, the actual DP use case
        # (VERDICT r4 item 1). With -t the OneEuro scan is sequential
        # across frames, so the per-stage path keeps DP correct.
        if do_temporal:
            self._fused_bypass_reason = (
                "data_parallel with -t: the OneEuro scan is sequential "
                "across frames")
            return
        if cfg.val_batch_size % pl.mesh.size:
            self._fused_bypass_reason = (
                f"val_batch_size={cfg.val_batch_size} does not divide "
                f"over the {pl.mesh.size}-device mesh")
            return

        # shard_map (not plain GSPMD jit) because the per-frame render
        # is a lax.map: a scan over a batch-SHARDED axis would
        # dynamic-slice across devices every iteration, while inside
        # shard_map each device lax.maps over its own local frames and
        # the overflow lax.cond stays a real per-frame branch.
        from jax.sharding import PartitionSpec
        from acr_tpu.parallel.mesh import replicated_sharding
        axis = cfg.mesh_axes[0]

        def _chunk_core(params, ml, mr, image, offsets):
            out = forward_fn(pl.net, params, ml, mr, image, offsets, cfg,
                             merge_params=pl.merge_params)
            if do_render:
                out = _render_chunk(out)
            return out

        # check_vma=False: the rasterizer's lax.scan carries start from
        # unvarying constants (zeros/inf z-buffer) and become
        # shard-varying on the first iteration, which the varying-axis
        # checker rejects; every output here is intentionally
        # per-shard-varying (batch axis), so the check buys nothing.
        core = jax.shard_map(
            _chunk_core, mesh=pl.mesh,
            in_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec(),
                      PartitionSpec(axis), PartitionSpec(axis)),
            out_specs=PartitionSpec(axis), check_vma=False)

        def _chunk_step_dp(params, ml, mr, state, image, offsets):
            out = core(params, ml, mr, image, offsets)
            # probe reduction runs OUTSIDE shard_map on the gathered
            # (B, 2) counts: global max/sum over the whole chunk
            out = _probe_reduce(out)
            return state, pack_outputs(out, self._chunk_spec,
                                       planar_rgba=True)

        rep = replicated_sharding(pl.mesh)
        sb = pl._batch_sharding
        self._jit_chunk_step = jax.jit(
            _chunk_step_dp, donate_argnums=(4, 5),
            in_shardings=(rep, rep, rep, rep, sb, sb),
            out_shardings=rep)

    def stream_step(self, meta: Dict):
        """One fused device dispatch for the streaming loop (no sync).

        Returns the PACKED device array; unpack after the readback with
        :meth:`unpack_stream`.
        """
        image = np.asarray(meta["image"])
        image = image.reshape(image.shape[0], image.shape[1], -1)
        self.filter_state, packed = self._jit_stream_step(
            self.pipeline.params, self.pipeline.mano_l,
            self.pipeline.mano_r, self.filter_state,
            image, np.asarray(meta["offsets"]))
        return packed

    def unpack_stream(self, packed) -> Dict:
        """Host-side unpack of the stream step's single packed buffer."""
        out = unpack_outputs(packed, self._stream_spec)
        self._consume_overflow_probe(out, n_frames=1)
        return out

    def _consume_overflow_probe(self, out: Dict, n_frames: int = 1):
        """Pop the capacity-probe scalars (if present) and log them.

        The fused steps compute the probe every step; the host logs it
        once every ``raster_overflow_every`` rendered frames (overflows
        always log as warnings).
        """
        overflow = out.pop("_raster_overflow", None)
        if overflow is None:
            return
        every = self.cfg.raster_overflow_every
        prev = getattr(self, "_probe_frame_idx", 0)
        self._probe_frame_idx = prev + n_frames
        stats = [int(x) for x in np.asarray(overflow).reshape(-1)]
        due = not every or prev == 0 \
            or prev // every != self._probe_frame_idx // every
        if stats[1] or stats[3] or due:
            self._log_overflow(*stats)

    def _log_overflow(self, max_tile: int, n_over: int,
                      max_band: int = 0, n_band_over: int = 0):
        if n_over:
            log.warning(
                "binned rasterizer overflow: %d tiles above capacity "
                "(max %d faces/tile) at render_size=%d — affected frames "
                "rendered via the exact flat-kernel fallback; raise "
                "viz.raster_pallas.BIN_CAP if this is frequent",
                n_over, max_tile, self.cfg.render_size)
        if n_band_over:
            log.warning(
                "banded rasterizer overflow: %d row bands above the "
                "band table capacity (max %d faces/band) at "
                "render_size=%d — affected frames rendered via the "
                "exact flat-kernel fallback even though every tile is "
                "under BIN_CAP; raise viz.raster_pallas.BAND_CAP if "
                "this is frequent", n_band_over, max_band,
                self.cfg.render_size)
        if not (n_over or n_band_over):
            log.debug("raster capacity probe: max %d faces/tile, "
                      "max %d faces/band, 0 overflows",
                      max_tile, max_band)

    # ------------------------------------------------------------------
    def process_frame(self, bgr_frame: np.ndarray, path: str
                      ) -> Dict[str, list]:
        """Full per-frame stack; returns reference-format results dict."""
        with self.timer.stage("preprocess"):
            meta = img_preprocess(bgr_frame, path,
                                  input_size=self.cfg.input_size)
        need_maps = "centermap" in self.cfg.show_items

        # Dispatch EVERYTHING device-side first (forward, smoothing,
        # refine, render), then read back once: device->host syncs are
        # the latency floor (60ms each through a relayed transport).
        with self.timer.stage("device_step"):
            out = self.pipeline(meta["image"], meta["offsets"],
                                return_maps=need_maps)
            if self.cfg.temporal_optimization:
                # per-hand gating by detection flag happens on device
                self.filter_state, poses, betas = self._smooth(
                    self.filter_state, out["poses"][0], out["betas"][0],
                    out["detection_flag"][0])
                out["poses"] = poses[None]
                out["betas"] = betas[None]
                out.update(self.pipeline.refine(out["poses"], out["betas"],
                                                out["cam"], meta["offsets"]))
            if self.visualizer is not None and self.cfg.renderer == "tpu":
                out["_rgba"] = self.visualizer.render_rgba_device(out)
                every = self.cfg.raster_overflow_every
                if every and self._frame_idx % every == 0:
                    # capacity telemetry rides the same readback
                    out["_raster_overflow"] = \
                        self.visualizer.overflow_probe_device(out)
            out = jax.device_get(out)          # ONE batched readback
        self._frame_idx += 1

        overflow = out.pop("_raster_overflow", None)
        if overflow is not None:
            self._log_overflow(
                *[int(x) for x in np.asarray(overflow).reshape(-1)])

        detected = np.asarray(out["detection_flag"])
        if not detected.any():
            log.info("no hand detected: %s", path)
            self._emit_frame(bgr_frame, path)
            return {path: []}

        if not self.cfg.jit_translation_solve:
            self._host_translation(out)

        results = reorganize_results(out, [path])
        if self.visualizer is not None:
            with self.timer.stage("render"):
                if "_rgba" in out:
                    # render_rgba_device emits planar (4, S, S)
                    rendered = self.visualizer.compose_on_frame(
                        out["_rgba"], bgr_frame, meta, planar=True)
                else:
                    rendered = self.visualizer.render_on_frame(
                        bgr_frame, out, meta)
            with self.timer.stage("encode"):
                self._emit_frame(rendered, path)
            aux_items = [i for i in self.cfg.show_items if i != "mesh"]
            if aux_items:
                for name, view in self.visualizer.aux_views(
                        out, meta, aux_items).items():
                    self._emit_frame(view[:, :, ::-1],
                                     self._aux_path(path, name))
        else:
            self._emit_frame(bgr_frame, path)
        return results

    def _host_translation(self, out: Dict):
        """Replace the on-device LS translation with the native host
        RANSAC solve (the reference's solvePnPRansac robustness contract;
        --jit_translation_solve false selects this parity mode)."""
        from acr_tpu.io import native
        if not native.available():
            log.warning("native library unavailable; keeping device LS")
            return
        j3d = np.asarray(out["j3d"])
        pj_px = (np.asarray(out["pj2d"]) + 1.0) * (self.cfg.input_size / 2.0)
        half = self.cfg.input_size / 2.0
        trans = np.zeros_like(np.asarray(out["cam_trans"]))
        for b in range(j3d.shape[0]):
            for hand in range(2):
                try:
                    trans[b, hand] = native.estimate_translation(
                        j3d[b, hand], pj_px[b, hand],
                        focal=float(self.cfg.focal_length), cx=half, cy=half)
                except ValueError:
                    trans[b, hand] = np.asarray(out["cam_trans"])[b, hand]
        out["cam_trans"] = trans

    @staticmethod
    def _aux_path(path: str, item: str) -> str:
        base, ext = os.path.splitext(os.path.basename(path))
        return f"{base}_{item}{ext or '.jpg'}"

    def _emit_frame(self, bgr_frame: np.ndarray, path: str):
        if self.cfg.demo_mode == "webcam" or not self.cfg.save_visualization_on_img:
            # webcam mode displays every frame like the reference
            # (acr/main.py:110-111); headless hosts degrade gracefully
            if self.cfg.demo_mode == "webcam" or self.cfg.interactive_vis:
                try:
                    import cv2
                    cv2.imshow("acr_tpu", bgr_frame)
                    cv2.waitKey(1)
                except Exception as exc:           # headless: no display
                    if not getattr(self, "_imshow_warned", False):
                        log.warning("cv2.imshow unavailable (%s); "
                                    "frames not displayed", exc)
                        self._imshow_warned = True
            return
        os.makedirs(self.output_dir, exist_ok=True)
        import cv2
        cv2.imwrite(os.path.join(self.output_dir, self._output_name(path)),
                    bgr_frame)

    def _output_name(self, path: str) -> str:
        """Unique output filename per input path.

        Recursive folder collection can yield same-named frames in
        different subdirectories (a/0001.jpg, b/0001.jpg); suffix
        collisions instead of silently overwriting.
        """
        base = os.path.basename(path)
        if not hasattr(self, "_name_map"):
            self._name_map: Dict[str, str] = {}
            self._used_names: set = set()
        if path in self._name_map:
            return self._name_map[path]
        name, k = base, 1
        stem, ext = os.path.splitext(base)
        while name in self._used_names:
            name = f"{stem}_{k}{ext}"
            k += 1
        self._name_map[path] = name
        self._used_names.add(name)
        return name

    # ------------------------------------------------------------------
    def run_image(self) -> Dict:
        imgpath = self.cfg.inputs
        if not imgpath or not os.path.exists(imgpath):
            raise FileNotFoundError(f"--inputs image not found: {imgpath}")
        self.output_dir = self.cfg.output_dir or \
            "./demos_outputs/single_images_output/"
        import cv2
        image = cv2.imread(imgpath)
        if image is None:
            raise ValueError(f"could not decode image: {imgpath}")
        results = self.process_frame(image, imgpath)
        if self.cfg.save_dict_results:
            save_results(imgpath, self.output_dir, results)
        return results

    def run_folder(self) -> Dict:
        inputs = self.cfg.inputs
        if not inputs or not os.path.exists(inputs):
            raise FileNotFoundError(f"--inputs not found: {inputs}")
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
        if self.cfg.val_batch_size > 1 and file_list:
            results = self._run_batched(file_list)
        else:
            for imgpath in file_list:
                frame = cv2.imread(imgpath)
                if frame is None:
                    log.warning("skipping unreadable image: %s", imgpath)
                    continue
                results.update(self.process_frame(frame, imgpath))
        dt = time.time() - t0
        if file_list:
            log.info("%d frames in %.2fs (%.2f FPS)",
                     len(file_list), dt, len(file_list) / dt)
            log.info("per-stage latency: %s",
                     {k: f"{v['avg_ms']:.1f}ms"
                      for k, v in self.timer.report().items()})
        if self.cfg.save_visualization_on_img and self.visualizer is not None:
            save_video(self.output_dir,
                       os.path.join(self.output_dir,
                                    os.path.basename(image_folder) + "_output"))
        if self.cfg.save_dict_results:
            save_results(image_folder, self.output_dir, results)
        return results

    run_video = run_folder    # video mode = split to frames, then folder mode

    def _run_batched(self, file_list) -> Dict:
        """Throughput path: fixed-size batches through the jitted step.

        One compilation serves every chunk (the last one is padded by
        repeating its final frame and trimmed after). Each frame is
        decoded and preprocessed exactly ONCE: rendering reuses the
        chunk's decoded frames/metas instead of a second cv2.imread +
        cubic resize (the host is single-core; double decode dominated
        visualized video wall-clock in round 1).

        Temporal smoothing runs chunk-wise with the OneEuro filter state
        carried across chunks — the filter is strictly causal, so this
        is mathematically identical to one whole-sequence lax.scan
        (tests/test_app.py pins the equality). Padded tail frames only
        advance the state after the last real frame, which nothing
        consumes. Memory stays bounded: only one chunk's frames are
        alive at a time, plus the small per-frame result dicts.
        """
        import cv2
        bs = self.cfg.val_batch_size
        # non-mesh show_items render per frame from the chunk outputs
        # (reference behaviour: acr/visualization.py:174-254); centermap
        # needs the heatmaps, which only the per-stage path emits
        aux_items = [] if self.visualizer is None else \
            [i for i in self.cfg.show_items if i != "mesh"]
        need_maps = "centermap" in aux_items
        # fused chunk step (forward + scan-OneEuro + refine + on-device
        # render + ONE packed readback) covers the common configs; the
        # legacy per-stage path remains for the host/native renderer,
        # the host translation solve, and centermap aux views
        fused = (self._jit_chunk_step is not None
                 and self.cfg.jit_translation_solve
                 and not need_maps
                 and (self.visualizer is None or self.cfg.renderer == "tpu"))
        if not fused:
            # make the FPS cliff diagnosable from output: the per-stage
            # path pays 4-5 relay dispatches per chunk instead of one
            why = (self._fused_bypass_reason
                   if self._jit_chunk_step is None
                   else "host translation solve"
                   if not self.cfg.jit_translation_solve
                   else "centermap aux view needs per-stage maps"
                   if need_maps else f"renderer={self.cfg.renderer}")
            log.info("fused chunk step bypassed (%s); using the "
                     "per-stage path", why)
        seq = None
        if not fused and self.cfg.temporal_optimization:
            seq = jax.jit(lambda st, p, b, d: smooth_sequence(
                st, p, b, d, self.cfg.smooth_coeff))

        def read_frame(path):
            frame = cv2.imread(path)
            if frame is None:
                log.warning("unreadable image, substituting black: %s", path)
                frame = np.zeros((64, 64, 3), np.uint8)
            return frame

        def prep_chunk(batch_paths):
            t0 = time.perf_counter()
            frames = [read_frame(p) for p in batch_paths]
            metas = [img_preprocess(f, p, input_size=self.cfg.input_size)
                     for f, p in zip(frames, batch_paths)]
            img_c = np.concatenate([m["image"] for m in metas])
            off_c = np.concatenate([m["offsets"] for m in metas])
            pad = bs - len(img_c)
            if pad:
                img_c = np.concatenate(
                    [img_c, np.repeat(img_c[-1:], pad, axis=0)])
                off_c = np.concatenate(
                    [off_c, np.repeat(off_c[-1:], pad, axis=0)])
            prep_ms = (time.perf_counter() - t0) * 1e3
            return batch_paths, frames, metas, img_c, off_c, pad, prep_ms

        # decode/preprocess the NEXT chunk on a producer thread while
        # the device runs the current one: the chunk prep (cv2.imread +
        # cubic resize) is host-bound and otherwise serializes with
        # device compute + the relay readback stall (SURVEY.md §7 step 8
        # double-buffering, applied to the batched path)
        import queue
        import threading
        chunk_q: "queue.Queue" = queue.Queue(maxsize=1)

        def producer():
            try:
                for i in range(0, len(file_list), bs):
                    chunk_q.put(("ok", prep_chunk(file_list[i:i + bs])))
            except BaseException as exc:          # surface in the consumer
                chunk_q.put(("error", exc))
            chunk_q.put(("done", None))

        threading.Thread(target=producer, daemon=True,
                         name="acr-chunk-prefetch").start()

        results: Dict = {}
        while True:
            kind, payload = chunk_q.get()
            if kind == "done":
                break
            if kind == "error":
                raise payload
            batch_paths, frames, metas, img_c, off_c, pad, prep_ms = payload
            self.timer.add("preprocess", prep_ms)
            with self.timer.stage("device_step"):
                if fused:
                    img_c = img_c.reshape(img_c.shape[0],
                                          img_c.shape[1], -1)
                    self.filter_state, packed = self._jit_chunk_step(
                        self.pipeline.params, self.pipeline.mano_l,
                        self.pipeline.mano_r, self.filter_state,
                        img_c, off_c)
                    o = unpack_outputs(packed, self._chunk_spec)
                    self._consume_overflow_probe(
                        o, n_frames=len(batch_paths))
                else:
                    o = self.pipeline(img_c, off_c, return_maps=need_maps)
                    if seq is not None:
                        self.filter_state, poses, betas = seq(
                            self.filter_state, o["poses"], o["betas"],
                            o["detection_flag"])
                        o["poses"], o["betas"] = poses, betas
                        o.update(self.pipeline.refine(poses, betas,
                                                      o["cam"], off_c))
                    o = jax.device_get(o)
            keep = bs - pad
            chunk = jax.tree.map(lambda v: np.asarray(v)[:keep], o)
            rgba = chunk.pop("_rgba", None)

            if not self.cfg.jit_translation_solve:
                self._host_translation(chunk)
            results.update(reorganize_results(chunk, batch_paths))

            for k, (path, frame, meta) in enumerate(
                    zip(batch_paths, frames, metas)):
                if not np.asarray(chunk["detection_flag"][k]).any():
                    self._emit_frame(frame, path)
                    continue
                if self.visualizer is not None:
                    one = {key: v[k:k + 1] for key, v in chunk.items()}
                    with self.timer.stage("render"):
                        if rgba is not None:
                            # device-rendered; unpack_outputs already
                            # moved planar back to (S, S, 4)
                            rendered = self.visualizer.compose_on_frame(
                                rgba[k], frame, meta, planar=False)
                        else:
                            rendered = self.visualizer.render_on_frame(
                                frame, one, meta)
                    self._emit_frame(rendered, path)
                    if aux_items:
                        for name, view in self.visualizer.aux_views(
                                one, meta, aux_items).items():
                            self._emit_frame(view[:, :, ::-1],
                                             self._aux_path(path, name))
                else:
                    self._emit_frame(frame, path)
        return results

    def run_webcam(self):
        from acr_tpu.pipeline.streaming import StreamingLoop
        cap = WebcamVideoStream(self.cfg.cam_id).start()

        def show(rendered, _out):
            self._emit_frame(rendered, "0")

        loop = StreamingLoop(self, on_result=show)
        try:
            loop.run(cap)
        finally:
            cap.stop()
            if loop.latencies:
                log.info("webcam p50 frame latency: %.1f ms",
                         loop.p50_latency_ms())

    def run(self) -> Optional[Dict]:
        mode = self.cfg.demo_mode
        if mode == "image":
            return self.run_image()
        if mode in ("video", "folder"):
            return self.run_folder()
        if mode == "webcam":
            return self.run_webcam()
        raise ValueError(f"unknown demo_mode: {mode}")
