"""acr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) two-hand 3D mesh recovery framework.

Re-designed from scratch with the capabilities of the ACR reference
(ZhengdiYu/Arbitrary-Hands-3D-Reconstruction, CVPR 2023): single-shot,
detection-free reconstruction of both hands from one RGB frame — center
heatmaps, MANO pose/shape regression with attention collaboration,
cross-hand interaction priors, weak-perspective cameras, part
segmentation, temporal smoothing, and mesh rendering — implemented as
fixed-shape jitted XLA programs with Pallas kernels on the hot paths.

Layout:
  config    — typed dataclass config + YAML overlay + CLI (reference: acr/config.py)
  ops       — rotation math, resampling, fused Pallas kernels
  models    — MANO hand model, HRNet backbone, regression heads (reference: mano/manolayer.py, acr/model.py)
  parser    — center-map decoding + parameter sampling + cross-hand prior (reference: acr/result_parser.py)
  pipeline  — end-to-end jitted inference, preprocessing, temporal filter, app driver (reference: acr/main.py, acr/utils.py)
  viz       — TPU rasterizer + compositing (reference: acr/renderer/*, acr/visualization.py)
  parallel  — device mesh / sharding helpers (reference: nn.DataParallel usage)
  io        — checkpoint/asset converters and result writers
"""

__version__ = "0.1.0"
