"""End-to-end jitted inference: uint8 frame batch -> hands.

The reference pipeline crosses the host/device boundary at least four
times per frame (parser branches, OneEuro, solvePnP, rendering —
SURVEY.md §3.1). Here the whole chain

    backbone -> heads -> center decode -> parameter sampling ->
    cross-hand prior -> 6D decode -> MANO -> weak-persp projection ->
    metric translation solve -> original-image keypoint mapping

is ONE jitted XLA program with fixed shapes: both hands always occupy a
slot (axis 1: [left, right]) and ``detection_flag`` is data, not
control flow. Host code only decodes/encodes frames.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acr_tpu.config import Config
from acr_tpu.io.params import load_params
from acr_tpu.models.acr import ACRNet
from acr_tpu.models.mano import ManoModel, load_mano_model, mano_forward
from acr_tpu.ops.mano_kernel import (
    ManoKernelData,
    build_kernel_data,
    mano_forward_fused,
)
from acr_tpu.parser.parse import parse_outputs
from acr_tpu.pipeline.project import (
    estimate_translation_ls,
    kp2d_to_org_image,
    weak_persp_project,
)


class ManoAuto(NamedTuple):
    """Both MANO representations, dispatched by batch size at trace time."""
    model: ManoModel
    kernel: ManoKernelData


# measured on v5e: pure JAX wins at demo batches (B<=64); the fused
# kernel wins 2x at B=1024 and is the only path that scales to B=4096
# (XLA's unfused chain slows superlinearly there). The crossover sits
# between 256 and 1024 in noisy relay measurements — 512 is the
# conservative switch point (docs/PERFORMANCE.md).
PALLAS_MANO_MIN_BATCH = 512


def _apply_mano(mano, poses, betas, center_idx):
    """Dispatch on asset type: fused Pallas kernel vs pure-JAX path.

    ``ManoAuto`` picks per call site from the STATIC batch size — XLA
    fuses the tiny pure-JAX MANO well at demo batches, while the Pallas
    kernel's VMEM-resident blendshape+LBS wins for bulk serving.
    """
    if isinstance(mano, ManoAuto):
        if poses.shape[0] >= PALLAS_MANO_MIN_BATCH:
            return mano_forward_fused(mano.kernel, poses, betas,
                                      center_idx=center_idx)
        return mano_forward(mano.model, poses, betas, center_idx=center_idx)
    if isinstance(mano, ManoKernelData):
        return mano_forward_fused(mano, poses, betas, center_idx=center_idx)
    return mano_forward(mano, poses, betas, center_idx=center_idx)


def _mano_projection_tail(mano_l, mano_r, poses, betas, cam, offsets,
                          cfg: Config) -> Dict[str, jnp.ndarray]:
    """Shared MANO -> weak-persp -> translation -> org-image tail.

    poses (B,2,48), betas (B,2,10), cam (B,2,3), offsets (B,10).
    Used by both the fresh forward and the post-smoothing refine so the
    pixel-space conventions can never desynchronize between them.
    """
    align = cfg.align_idx if cfg.mano_mesh_root_align else None
    verts_l, j3d_l, _ = _apply_mano(mano_l, poses[:, 0], betas[:, 0], align)
    verts_r, j3d_r, _ = _apply_mano(mano_r, poses[:, 1], betas[:, 1], align)
    verts = jnp.stack([verts_l, verts_r], axis=1)      # (B, 2, 778, 3)
    j3d = jnp.stack([j3d_l, j3d_r], axis=1)            # (B, 2, 21, 3)
    verts_camed = weak_persp_project(verts, cam, keep_dim=True)
    pj2d = weak_persp_project(j3d, cam)                # [-1, 1]
    pj2d_px = (pj2d + 1.0) * (cfg.input_size / 2.0)    # reference: utils.py:404
    cam_trans = estimate_translation_ls(
        j3d, pj2d_px, focal=cfg.focal_length,
        img_size=(cfg.input_size, cfg.input_size))
    return {
        "verts": verts, "j3d": j3d, "verts_camed": verts_camed,
        "pj2d": pj2d, "pj2d_org": kp2d_to_org_image(pj2d, offsets[:, None, :]),
        "cam_trans": cam_trans,
    }


def forward_fn(net: ACRNet,
               params: Dict[str, Any],
               mano_l: ManoModel,
               mano_r: ManoModel,
               image: jnp.ndarray,
               offsets: jnp.ndarray,
               cfg: Config,
               return_maps: bool = False,
               merge_params: Optional[Dict[str, jnp.ndarray]] = None
               ) -> Dict[str, jnp.ndarray]:
    """Pure function: (params, manos, uint8 image, offsets (B,10))
    -> output dict with hand axis [left, right].

    ``image`` is (B,S,S,3) or flattened (B,S,S*3). The frame buffer
    should cross the jit boundary FLATTENED: a (B,S,S,3) uint8 jit
    argument tiles its minor dims (S,3) as (32,128) on TPU, so the
    3-channel lane dim pads 42x in HBM (~268 MB at 512px/b8, ~0.8
    ms/step just to read); (S, S*3) tiles compactly (1536 = 12*128
    lanes). 4-D calls still work (CPU tests, parity harness).
    """
    b, s = image.shape[0], image.shape[1]
    image = image.reshape(b, s, s, 3)
    outputs = net.apply(params, image)
    parsed = parse_outputs(
        outputs,
        conf_thresh=cfg.centermap_conf_thresh,
        prior_mode=cfg.prior_mode if cfg.inter_prior else "none",
        prior_gate_px=cfg.prior_gate_px,
        centermap_size=cfg.centermap_size,
        merge_params=merge_params,
        nms_kernel=cfg.kernel_sizes[-1],
        max_hand=cfg.max_hand,
        rot_type=cfg.Rot_type,
        rot_dim=cfg.rot_dim,
        theta_num=cfg.mano_theta_num,
        beta_dim=cfg.beta_dim)

    out = {
        "params": parsed.params,
        "cam": parsed.cam,
        "poses": parsed.poses,
        "betas": parsed.betas,
        "detection_flag": parsed.detection_flag,
        "centers": parsed.centers,
        "centers_conf": parsed.centers_conf,
    }
    out.update(_mano_projection_tail(mano_l, mano_r, parsed.poses,
                                     parsed.betas, parsed.cam, offsets, cfg))
    if return_maps:
        # host-side viz consumers (cv2/np) don't speak bfloat16; the
        # cast happens only on this explicitly-requested path
        out["l_center_map"] = outputs["l_center_map"].astype(jnp.float32)
        out["r_center_map"] = outputs["r_center_map"].astype(jnp.float32)
        out["segms"] = outputs["segms"].astype(jnp.float32)
    return out


def mano_refine_fn(mano_l: ManoModel, mano_r: ManoModel,
                   poses: jnp.ndarray, betas: jnp.ndarray, cam: jnp.ndarray,
                   offsets: jnp.ndarray, cfg: Config) -> Dict[str, jnp.ndarray]:
    """MANO + projection only, for re-running after temporal smoothing.

    poses (B,2,48), betas (B,2,10), cam (B,2,3), offsets (B,10).
    """
    return _mano_projection_tail(mano_l, mano_r, poses, betas, cam,
                                 offsets, cfg)


class ACRPipeline:
    """Stateful convenience wrapper: owns params/assets + jitted callables."""

    def __init__(self, cfg: Config, params: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.model_precision == "bf16" else jnp.float32
        self.net = ACRNet(dtype=dtype, inter_prior=cfg.inter_prior,
                          head_block_num=cfg.head_block_num,
                          params_ch=cfg.map_channels,
                          offset_mode=cfg.offset_mode,
                          s2d_highres=cfg.s2d_highres,
                          s2d_segm=cfg.s2d_segm,
                          s2d_stem=cfg.s2d_stem,
                          merged_heads=cfg.merged_heads,
                          quantize=cfg.quantize)
        self.params = params if params is not None else load_params(cfg.model_path)
        if (cfg.s2d_highres or cfg.s2d_segm or cfg.s2d_stem
                or cfg.merged_heads):
            # exact weight rewrite for the space-to-depth high-res
            # branch / segm head / packed stem / merged head
            # transitions; checkpoints stay canonical on disk
            # (models/s2d.py)
            from acr_tpu.models.s2d import transform_params_s2d
            self.params = transform_params_s2d(
                self.params, highres=cfg.s2d_highres, segm=cfg.s2d_segm,
                stem=cfg.s2d_stem, merged_heads=cfg.merged_heads,
                inter_prior=cfg.inter_prior)
        # merge-mode cross-hand fusion head (converted from the reference's
        # ResultParser.fusion_fc_end) is carried outside the network tree
        self.merge_params = None
        tree = self.params.get("params", {})
        if "parser" in tree:
            self.merge_params = tree.pop("parser").get("fusion_fc")
        if cfg.model_precision == "bf16" and cfg.quantize == "none":
            # store weights PRE-CAST to bf16: the bf16 compute path
            # casts fp32 masters on every step anyway (flax dtype
            # promotion), so fp32 storage makes each step read 2x the
            # weight bytes from HBM plus a cast — measured as the bf16
            # b1 stream step landing SLOWER than fp32 (BENCH_r03,
            # docs/PERFORMANCE.md). Values are bit-identical to the
            # in-graph cast (same round-to-nearest-even).
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == jnp.float32 else x,
                self.params)
        if cfg.quantize.startswith(("int8", "int4")):
            # W8A8 backbone+segm (ops/quant.py): default calibration on
            # the committed real-frame set at load (synthetic fallback);
            # call .calibrate(real_frames) for deployment-specific scales
            self._float_params = self.params
            self.calibrate()
        self.mano_l, faces_l = load_mano_model(cfg.mano_model_path, "left")
        self.mano_r, faces_r = load_mano_model(cfg.mano_model_path, "right")
        self.faces = np.stack([faces_l, faces_r])      # (2, 1538, 3)
        mode = cfg.use_pallas_mano
        if mode != "off" and jax.default_backend() not in ("cpu",):
            # fused Pallas blendshape+LBS kernel (TPU backends only; the
            # pure-JAX path serves CPU tests). 'auto' (default) keeps
            # both and dispatches on batch size (PALLAS_MANO_MIN_BATCH)
            if mode == "on":
                self.mano_l = build_kernel_data(self.mano_l)
                self.mano_r = build_kernel_data(self.mano_r)
            else:
                self.mano_l = ManoAuto(self.mano_l,
                                       build_kernel_data(self.mano_l))
                self.mano_r = ManoAuto(self.mano_r,
                                       build_kernel_data(self.mano_r))

        # optional data-parallel mesh: frame batch sharded over chips,
        # params replicated (folder/video throughput mode)
        self.mesh = None
        jit_kwargs = {}
        if cfg.data_parallel > 1:
            from acr_tpu.parallel.mesh import (
                batch_sharding, init_distributed, make_mesh,
                replicated_sharding)
            # multi-host: join the distributed runtime first so the
            # mesh spans every process's devices (DCN data parallelism)
            init_distributed(cfg.coordinator, cfg.num_processes,
                             cfg.process_id)
            self.mesh = make_mesh(cfg.data_parallel,
                                  axis_name=cfg.mesh_axes[0])
            self._batch_sharding = batch_sharding(
                self.mesh, axis_name=cfg.mesh_axes[0])
            rep = replicated_sharding(self.mesh)
            jit_kwargs = dict(
                in_shardings=(rep, rep, rep, self._batch_sharding,
                              self._batch_sharding),
                out_shardings=rep)

        # the frame/offset buffers are fresh per call and never reused
        # on the host — donate them so the runtime reclaims their HBM at
        # execution instead of at Python GC time (SURVEY.md §7 step 8).
        # The uint8 image can never alias the fp32 outputs, so XLA's
        # "donated buffers were not usable" note is expected, not a bug.
        import warnings
        warnings.filterwarnings(
            "ignore", message="Some donated buffers were not usable")
        self._jit_forward = jax.jit(
            lambda p, ml, mr, img, off: forward_fn(
                self.net, p, ml, mr, img, off, cfg,
                merge_params=self.merge_params),
            donate_argnums=(3, 4),
            **jit_kwargs,
        )
        self._jit_forward_maps = jax.jit(
            lambda p, ml, mr, img, off: forward_fn(
                self.net, p, ml, mr, img, off, cfg, return_maps=True,
                merge_params=self.merge_params),
            donate_argnums=(3, 4),
            **jit_kwargs,
        )
        self._jit_refine = jax.jit(
            lambda poses, betas, cam, off: mano_refine_fn(
                self.mano_l, self.mano_r, poses, betas, cam, off, cfg),
        )

    def __call__(self, image: np.ndarray, offsets: np.ndarray,
                 return_maps: bool = False) -> Dict[str, jnp.ndarray]:
        """image: uint8 (B, S, S, 3); offsets: float32 (B, 10).

        Under data_parallel > 1 a batch that doesn't divide the mesh is
        padded (repeating the last frame) and outputs are trimmed, so
        batch-1 image/webcam modes work on any mesh size.
        """
        image = np.asarray(image)
        if image.ndim == 4:
            # flatten (B,S,S,3)->(B,S,S*3): compact TPU lane tiling for
            # the uint8 upload (see forward_fn docstring); free view
            image = image.reshape(image.shape[0], image.shape[1], -1)
        offsets = np.asarray(offsets)
        batch = image.shape[0]
        pad = 0
        if self.mesh is not None:
            n = self.mesh.size
            pad = (-batch) % n
            if pad:
                image = np.concatenate(
                    [image, np.repeat(image[-1:], pad, axis=0)])
                offsets = np.concatenate(
                    [offsets, np.repeat(offsets[-1:], pad, axis=0)])
            image = jax.device_put(jnp.asarray(image), self._batch_sharding)
            offsets = jax.device_put(jnp.asarray(offsets),
                                     self._batch_sharding)
        else:
            image = jnp.asarray(image)
            offsets = jnp.asarray(offsets)
        fn = self._jit_forward_maps if return_maps else self._jit_forward
        out = fn(self.params, self.mano_l, self.mano_r, image, offsets)
        if pad:
            out = jax.tree.map(lambda v: v[:batch], out)
        return out

    def refine(self, poses, betas, cam, offsets) -> Dict[str, jnp.ndarray]:
        return self._jit_refine(jnp.asarray(poses), jnp.asarray(betas),
                                jnp.asarray(cam), jnp.asarray(offsets))

    def calibrate(self, images=None) -> None:
        """(Re)quantize the int8 path: calibrate per-conv activation
        scales on ``images`` (list of uint8 (B,S,S,3) frames) and
        re-quantize weights from the retained float tree.

        Default calibration uses the committed real-frame set
        (model_data/calib — reference demo photo variants + the two
        synthetic structural bounds; tools/make_calib_frames.py),
        falling back to the synthetic-only pair when the artifact is
        absent. Pass deployment frames for scenario-specific scales
        (ops/quant.py).
        """
        assert self.cfg.quantize.startswith(("int8", "int4")), \
            "calibrate() needs quantize=int8|int8_pc|int8_r|int4w"
        from acr_tpu.ops.quant import committed_calibration_frames, \
            quantize_for_net
        if images is None:
            import logging
            # load the committed set ONCE and pass it through — the
            # fallback decision and the data come from the same call
            # (quantize_for_net would otherwise re-read and re-slice
            # the 2.9 MB npz immediately; ADVICE r5)
            images = committed_calibration_frames(self.cfg.input_size)
            if images is None:
                # make the implicit fallback visible to operators:
                # serving with synthetic-frame scales clips real
                # activations outside the synthetic range with no other
                # signal (ADVICE r2)
                logging.getLogger("acr_tpu").warning(
                    "int8 activation scales calibrated on SYNTHETIC "
                    "frames (uniform noise + mid-gray); call "
                    "ACRPipeline.calibrate(real_frames) before "
                    "production serving for representative scales "
                    "(ops/quant.py)")
            else:
                logging.getLogger("acr_tpu").info(
                    "int8 activation scales calibrated on the committed "
                    "real-frame set (model_data/calib, "
                    "tools/make_calib_frames.py); call "
                    "ACRPipeline.calibrate(real_frames) to recalibrate "
                    "for a specific deployment")
        self.params = quantize_for_net(
            self.net, self._float_params, images=images,
            input_size=self.cfg.input_size,
            per_channel=self.cfg.quantize.endswith("_pc"),
            weight_bits=4 if self.cfg.quantize == "int4w" else 8)
