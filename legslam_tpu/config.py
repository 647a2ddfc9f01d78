"""Global numeric constants and configuration dataclasses.

Parity-critical constants mirror the reference CUDA implementation
(see SURVEY.md §7.0): cuda_rasterizer/config.h:15-18, auxiliary.h:21-44,
forward.cu:82-111,199,229-232,340-357.
"""
from __future__ import annotations

import dataclasses
from typing import Any

# ---------------------------------------------------------------------------
# Rasterizer constants (reference: cuda_rasterizer/config.h, auxiliary.h)
# ---------------------------------------------------------------------------
NUM_CHANNELS = 3          # RGB channels                (config.h:15)
LF_CHANNELS = 64          # language-feature channels   (config.h:16, -DLANGUAGE_FEATURES_DIM=64)
SH_DEGREE_MAX = 3
SH_COEFFS_MAX = (SH_DEGREE_MAX + 1) ** 2  # 16

# TPU tile for compositing. The reference uses 8x8 CUDA tiles (config.h:17-18);
# on TPU we pick a lane-aligned tile: last dim 128 (VPU/MXU lanes), sublane 16.
TILE_H = 16
TILE_W = 128

# Numerical guards (forward.cu)
COV2D_LOWPASS = 0.3       # added to cov2D diagonal       (forward.cu:110-111)
VIEW_CLAMP = 1.3          # t.xy clamp factor * tanfov    (forward.cu:82-87)
PROJ_W_EPS = 1e-7         # p_w = 1/(p_hom.w + 1e-7)      (forward.cu:199)
NEAR_CLIP = 0.2           # frustum near-cull             (auxiliary.h:154)
ALPHA_MAX = 0.99          # alpha clamp                   (forward.cu:344)
ALPHA_MIN = 1.0 / 255.0   # alpha skip threshold          (forward.cu:345)
T_TERMINATE = 1e-4        # transmittance termination     (forward.cu:353-357)
RADIUS_EIG_GUARD = 0.1    # max(0.1, mid^2 - det)         (forward.cu:230-231)

# Spherical harmonics constants (auxiliary.h:21-38)
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

# Model init (gaussian_model.cpp:156-167)
INIT_OPACITY = 0.1            # stored as inverse_sigmoid(0.1)
KNN_DIST_CLAMP = 1e-7         # clamp_min on mean 3-NN sq dist before log-scale

# Loss (gaussian_mapper.cpp:716-721, loss_utils.h)
SSIM_WINDOW = 11
SSIM_SIGMA = 1.5
SSIM_C1 = 0.01 ** 2
SSIM_C2 = 0.03 ** 2

# Camera projection (gaussian_keyframe.cpp:171-192)
Z_NEAR = 0.01
Z_FAR = 100.0

# Language encoder (cfg/encoder/pca_encoder_scannet.yaml, encoder_models.cpp)
ENCODER_INPUT_SIZE = 518
ENCODER_PATCH = 14
ENCODER_GRID = 37             # 518 / 14
ENCODER_TOKENS = 1369         # 37 * 37
ENCODER_FEAT_DIM = 768
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    """Training hyperparameters (reference: gaussian_parameters.cpp /
    cfg/gaussian_mapper/RGB-D/Replica/replica_rgbd.yaml defaults)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    lang_feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    densify_min_opacity: float = 0.02  # min_opacity at prune (gaussian_mapper.cpp:751)
    prune_big_point_after_iter: int = 0
    max_screen_size: float = 20.0      # radii2D prune threshold px
    extent_scale_prune: float = 0.1    # scale > 0.1*extent prune rule
    sh_degree: int = 3
    sh_degree_interval: int = 1000     # +1 active degree every N iters (gaussian_mapper.cpp:663)
    adam_eps: float = 1e-15
    # f_rest LR = feature_lr / 20 (gaussian_model.cpp:488-511)


@dataclasses.dataclass(frozen=True)
class MapperParams:
    """Online mapper parameters (gaussian_mapper.cpp:223-359 config surface)."""

    min_num_initial_map_kfs: int = 15
    new_keyframe_times_of_use: int = 8
    local_BA_increased_times_of_use: int = 0
    loop_closure_increased_times_of_use: int = 2
    cull_keyframes: bool = True
    large_rot_th: float = 20.0
    large_trans_th: float = 0.5
    stable_num_iter_existence: int = 30
    do_gaus_pyramid_training: bool = True
    num_gaus_pyramid_sub_levels: int = 2
    gaus_pyramid_times_of_use: tuple = (8, 8)
    do_inactive_geo_densify: bool = True
    depth_cache: int = 10
    min_num_inactive_geo_densify: int = 30
    max_depth_cached: int = 10
    rgbd_min_depth: float = 1e-10
    rgbd_max_depth: float = 40.0
    position_lr_max_steps_slam: int = 24   # per-KF use-count LR clamp
    keep_training_after_shutdown: bool = False


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static configuration of the tile rasterizer (shapes under jit)."""

    tile_h: int = TILE_H
    tile_w: int = TILE_W
    # per-gaussian static tile-span cap (pairs beyond are dropped);
    # 4x8 tiles of 128x16 px covers gaussians up to ~±192px horizontally /
    # ±56px vertically — prune caps radii at 20px in steady state
    max_span_x: int = 4
    max_span_y: int = 8
    # per-tile chunk of gaussians composited per scan step
    chunk: int = 256
    # tiles processed per lax.map batch (memory knob, xla backend)
    tile_batch: int = 32
    # compositing backend: "xla" (portable, exact-parity reference) or
    # "pallas" (TPU kernels: fused fwd + custom-VJP bwd, early termination)
    backend: str = "xla"
    # static cap of gathered pair rows for the pallas backend (multiple of
    # 64 for the chunked gathers)
    max_pairs: int = 1 << 20
    # run pallas kernels in interpreter mode (CPU tests)
    pallas_interpret: bool = False
    # use the Pallas bitonic sort for binning (pair keys + depth order);
    # not stable for exactly-tied depths (float ties are measure-zero)
    pallas_sort: bool = False
    # rank-block bucketed binning (pallas backend): XLA's batched sort of
    # [B, n/B] rows is ~3x faster than one flat sort; 1 = flat
    n_buckets: int = 1
    # per-bucket pair capacity (multiple of chunk); only used when
    # n_buckets > 1. Total gathered pairs = n_buckets * bucket_cap.
    bucket_cap: int = 1 << 16

    def span(self) -> int:
        return self.max_span_x * self.max_span_y


def _coerce(value: str) -> Any:
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            pass
    if value in ("true", "True"):
        return True
    if value in ("false", "False"):
        return False
    return value


def load_opencv_yaml(path: str) -> dict:
    """Parse the reference's OpenCV FileStorage YAML ("%YAML:1.0") configs.

    Reference read sites: src/gaussian_mapper.cpp:223-359. OpenCV YAML is not
    valid YAML 1.1 (the "%YAML:1.0" directive and bare keys with dots), so we
    parse the `key: value` lines directly.
    """
    out: dict = {}
    with open(path, "r") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or line.startswith("%") or line.startswith("---"):
                continue
            if ":" not in line:
                continue
            key, _, value = line.partition(":")
            key, value = key.strip(), value.strip().strip('"')
            if not value:
                continue
            out[key] = _coerce(value)
    return out
