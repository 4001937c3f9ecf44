"""Configuration tree for the RIDERS-TPU framework.

The reference configures itself through six near-identical forked scripts
(train_zju.py:426-487, val_zju.py:313-394, RCNet/train_rcnet_zju.py:5-72,
RCNet/run_rcnet_zju.py:19-47 and their *_ntu twins).  Here the ZJU/NTU
variation is a config preset: one dataclass tree, two factory functions.

All shapes are static by construction (TPU/XLA requirement): image sizes,
patch sizes, the padded radar-point bucket `max_points`, and the SML network
input resolution are part of the config, not discovered from data.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """On-disk dataset layout and geometry (reference README.md:16-31)."""

    name: str = "zju"
    root: str = ""
    # Directory names inside each scene directory.
    image_dir: str = "thermal_undistort"
    mono_pred_dir: str = "any"          # monocular depth prior (e.g. DepthAnything)
    radar_dir: str = "radar_png"
    gt_interp_dir: str = "lidar_png_int"
    gt_sparse_dir: str = "lidar_png"
    rcnet_output_dir: str = "output"    # root for quasi-dense rcnet depth maps
    # Image geometry (H, W).  ZJU thermal: 480x640; NTU thermal: 512x640.
    image_shape: Tuple[int, int] = (480, 640)
    train_scenes: Tuple[str, ...] = ()
    val_scenes: Tuple[str, ...] = ()
    # Fixed radar-point bucket for static shapes (reference samples 30-40
    # points per frame: RCNet/train_rcnet_zju.py:30, train_rcnet_ntu.py).
    max_points: int = 64


@dataclasses.dataclass(frozen=True)
class AlignmentConfig:
    """Stage-1 global scale alignment (reference modules/estimator.py).

    ``mode`` 's' = bounded 1-D scale search (estimator.py:136-160),
    'st' = closed-form scale+shift least squares (estimator.py:5-29).
    Bounds depend on whether the mono prior is inverse or positive depth
    (estimator.py:146-150).
    """

    mode: str = "s"                     # 's' | 'st'
    mono_type: str = "inv"              # 'inv' | 'pos'
    bounds_inv: Tuple[float, float] = (0.01, 0.3)
    bounds_pos: Tuple[float, float] = (0.5, 1.6)
    iterations: int = 64                # golden-section iterations (fixed count)
    # Clamps applied to the aligned inverse-depth map (estimator.py:166-176,
    # val_zju.py:320-321): output <= 1/min_pred, output >= 1/max_pred.
    min_pred: float = 0.1
    max_pred: float = 255.0
    # Input-depth validity window (val_zju.py:374-375, train_zju.py:476-477).
    min_depth: float = 0.0
    max_depth: float = 100.0
    # Static upper bound on valid alignment-target pixels per frame.  The
    # fused pipeline satisfies it by construction (radar points scatter
    # from the <=max_points bucket) and the input pipeline enforces it
    # host-side on loaded radar maps; it lets the on-device L1 solve run
    # on a gathered pixel bucket instead of the full frame (ops/alignment.
    # optimize_scale).  Set to None to force the exact dense objective for
    # dense alignment targets (e.g. a lidar-aligned variant).
    max_valid_pixels: Optional[int] = 512


@dataclasses.dataclass(frozen=True)
class SMLConfig:
    """Scale Map Learner network (reference modules/midas/midas_net_custom.py:22).

    MiDaS-small topology: 3->3 learned stem, efficientnet-lite3 encoder,
    four RefineNet-style fusion blocks, output conv; the head regresses a
    scale map applied multiplicatively to the aligned mono prior.
    """

    # 'midas-small' | 'midas-small-depth' | 'dpt-large'
    # (train_zju.py:170-195 model_type switch)
    model_type: str = "midas-small"
    features: int = 64
    expand: bool = True
    in_channels: int = 3                # (int_depth, int_scales, gray)
    backbone: str = "efficientnet_lite3"
    align_corners: bool = True          # fusion-block upsample convention
    # Network input resolution (H, W), multiple of 32 (val_zju.py:324 uses
    # 288 with aspect-keeping 'minimal' resize -> 288x384 for 480x640 input).
    net_shape: Tuple[int, int] = (288, 384)
    # Output regression: pred = d * relu(1 + out), then inverse-depth clamps
    # (midas_net_custom.py:121-130).
    regress_mode: str = "scale"         # 'scale' (videpth) | 'depth' (direct)
    min_pred: float = 0.1
    max_pred: float = 255.0
    # Intermediate-channel normalization (modules/midas/transforms.py:330-335).
    int_depth_mean: float = 0.729
    int_depth_std: float = 0.210
    int_scales_mean: float = 0.404
    int_scales_std: float = 0.117


@dataclasses.dataclass(frozen=True)
class RCNetConfig:
    """RC-Net radar-pixel correspondence network (reference RCNet/).

    Patch of `patch_size` (H, W) centred on every radar point; ResNet18-style
    full-image encoder, MLP point encoder, RoI-pooled fusion with LoFTR
    linear attention, multi-scale U-Net decoder to per-pixel correspondence
    logits (RCNet/networks.py:335-451, rcnet_model.py:35-99).
    """

    patch_size: Tuple[int, int] = (240, 100)        # ZJU; NTU uses (150, 50)
    input_channels_image: int = 3
    input_channels_depth: int = 3
    n_filters_encoder_image: Tuple[int, ...] = (32, 64, 128, 128, 128)
    n_neurons_encoder_depth: Tuple[int, ...] = (32, 64, 128, 128, 128)
    n_filters_decoder: Tuple[int, ...] = (256, 128, 64, 32, 16)
    # Number of decoder output scales (networks.py:466-510).  The shipped
    # reference configs use 1 (rcnet_model.py:86); >1 emits the coarse
    # logits list for multi-scale supervision.
    n_resolution: int = 1
    attention_layers: int = 4                       # x (self, cross)
    attention_heads: int = 8
    use_batch_norm: bool = True
    activation: str = "leaky_relu"                  # negative_slope 0.2
    # Inference composition (RCNet/run_rcnet_zju.py:47, :254-264).
    response_threshold: float = 0.1                 # NTU: 0.4
    threshold_decay: float = 0.05                   # adaptive retry step
    max_threshold_retries: int = 8
    # Apply the reference's adaptive threshold decay in the FUSED pipeline
    # too (closed form, ops/patches.adaptive_threshold_value - no loop
    # cost).  The staged pipeline always applies it.
    adaptive_composition: bool = True
    normalized_image_range: Tuple[float, float] = (0.0, 1.0)

    @property
    def encoder_downsample(self) -> int:
        """Total encoder stride: stem /2 then one /2 per residual stage
        after the first — 2^n_stages (networks.py:10-270; /32 for the
        reference's 5-stage encoder)."""
        return 2 ** len(self.n_filters_encoder_image)

    @property
    def latent_shape(self) -> Tuple[int, int]:
        """Latent patch grid: patch // encoder stride (rcnet_model.py:55-57;
        // 32 in the reference's fixed topology)."""
        d = self.encoder_downsample
        return (self.patch_size[0] // d, self.patch_size[1] // d)


@dataclasses.dataclass(frozen=True)
class RCNetTrainConfig:
    """RC-Net training budget (RCNet/train_rcnet_zju.py:5-72)."""

    batch_size: int = 4
    learning_rates: Tuple[float, ...] = (2e-4,)
    learning_schedule: Tuple[int, ...] = (100,)     # epoch boundaries
    points_per_frame: int = 30                      # NTU: 40
    w_positive_class: float = 2.5
    max_distance_correspondence: float = 0.5        # metres
    set_invalid_to_negative_class: bool = False
    sample_probability_of_lidar: float = 0.10       # pseudo-radar augmentation
    augmentation_probability: float = 1.0
    random_brightness: Tuple[float, float] = (0.6, 1.4)
    random_contrast: Tuple[float, float] = (0.6, 1.4)
    random_saturation: Tuple[float, float] = (0.6, 1.4)
    # Reference ZJU/NTU configs both train with horizontal flips
    # (train_rcnet_zju.py:59).
    random_flip_type: Tuple[str, ...] = ("horizontal",)
    # Per-point noise on the radar points fed to the point encoder
    # (rcnet_transforms.py:158-168,398-432); 'none'/'gaussian'/'uniform',
    # disabled in both reference configs (train_rcnet_zju.py:57-58).
    random_noise_type: str = "none"
    random_noise_spread: float = -1.0
    n_step_per_summary: int = 100
    n_step_per_checkpoint: int = 2000


@dataclasses.dataclass(frozen=True)
class SMLTrainConfig:
    """SML training budget (train_zju.py:445-470)."""

    batch_size: int = 12
    learning_rates: Tuple[float, ...] = (1e-4, 5e-5)
    learning_schedule: Tuple[int, ...] = (20, 200)
    loss_func: str = "l1"
    w_lidar_loss: float = 1.5                       # NTU: 1.0
    w_smoothness: float = 0.2
    w_edge: float = 0.0
    w_unsupervised: float = 0.0
    w_weight_decay: float = 0.0
    sobel_filter_size: int = 7
    gt_outlier_removal_kernel_size: int = 3
    gt_outlier_removal_threshold: float = 1.5
    gt_dilation_kernel_size: int = -1
    random_flip: bool = True
    random_crop_size: Optional[Tuple[int, int]] = None
    random_radar_noise: Optional[Tuple[float, float]] = (-0.01, 0.01)
    random_rcnet_thresholds: Optional[Tuple[float, ...]] = None
    # Scale-map knot source (train_zju.py:483, val_zju.py:81-84):
    # 'rcnet_<thr>' reads stage-2 quasi-dense PNGs; 'none' uses raw radar
    # knots only; 'interp' densifies the knots over the frame
    # (modules/interpolator.py Interpolator2D, device IDW approximation).
    rcnet_interp: str = "rcnet_0.1"
    # Validation-time knot source when it differs from training (the NTU
    # protocol trains on rcnet_0.4 and validates on rcnet_0.5 -
    # train_ntu.py:482 vs val_ntu.py:399); None = same as rcnet_interp.
    rcnet_interp_val: Optional[str] = None
    n_step_per_summary: int = 10
    n_step_per_checkpoint: int = 1000


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol (val_zju.py:374-378; val_ntu.py:392)."""

    min_depth_val: float = 0.0
    max_depth_val: float = 50.0                     # NTU: 70.0
    delta_threshold: float = 1.25
    save_output: bool = False


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding layout.

    The reference's only parallelism is single-host DataParallel
    (rcnet_model.py:259-265).  Here parallelism is a first-class sharding
    over a JAX mesh: `data` shards the frame batch, `points` optionally
    shards the per-frame radar-point patch axis for RC-Net.
    """

    data_axis: str = "data"
    points_axis: str = "points"
    data_parallel: int = -1             # -1: use all devices
    points_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class RidersConfig:
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    alignment: AlignmentConfig = dataclasses.field(default_factory=AlignmentConfig)
    sml: SMLConfig = dataclasses.field(default_factory=SMLConfig)
    rcnet: RCNetConfig = dataclasses.field(default_factory=RCNetConfig)
    rcnet_train: RCNetTrainConfig = dataclasses.field(default_factory=RCNetTrainConfig)
    sml_train: SMLTrainConfig = dataclasses.field(default_factory=SMLTrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # Numerics: compute dtype for model matmuls/convs; params stay fp32.
    compute_dtype: str = "bfloat16"

    def replace(self, **kw) -> "RidersConfig":
        return dataclasses.replace(self, **kw)


def zju_config(root: str = "", **overrides) -> RidersConfig:
    """ZJU-Multispectrum preset (train_zju.py:429-487, val_zju.py:313-394)."""
    cfg = RidersConfig(
        dataset=DatasetConfig(
            name="zju",
            root=root,
            image_shape=(480, 640),
            train_scenes=(
                "2023-10-19-19-25-47",
                "2023-10-20-10-05-18", "2023-10-20-10-21-14",
                "2023-10-20-10-35-20", "2023-10-20-13-56-28",
                "2023-10-20-14-23-10", "2023-10-20-14-28-18",
                "2023-10-20-14-38-17", "2023-10-20-14-53-28",
            ),
            val_scenes=(
                "2023-10-20-10-07-22",
                "2023-10-20-10-28-46",
                "2023-10-20-14-35-31",
            ),
        ),
        sml=SMLConfig(net_shape=(288, 384)),
        rcnet=RCNetConfig(patch_size=(240, 100), response_threshold=0.1),
        rcnet_train=RCNetTrainConfig(points_per_frame=30, batch_size=4),
        sml_train=SMLTrainConfig(w_lidar_loss=1.5, rcnet_interp="rcnet_0.1"),
        eval=EvalConfig(max_depth_val=50.0),
    )
    return cfg.replace(**overrides) if overrides else cfg


def ntu_config(root: str = "", **overrides) -> RidersConfig:
    """NTU4DRadLM preset (train_ntu.py, val_ntu.py, RCNet/*_ntu.py deltas:
    patch 150x50, 40 pts/frame, response thr 0.4/0.5, w_lidar 1.0,
    eval cap 70 m, 512x640 thermal frames)."""
    cfg = RidersConfig(
        dataset=DatasetConfig(
            name="ntu",
            root=root,
            image_shape=(512, 640),
            max_points=96,
        ),
        sml=SMLConfig(net_shape=(288, 352)),
        rcnet=RCNetConfig(patch_size=(150, 50), response_threshold=0.4),
        rcnet_train=RCNetTrainConfig(
            points_per_frame=40, batch_size=24, learning_rates=(2e-4,)),
        sml_train=SMLTrainConfig(
            w_lidar_loss=1.0,
            # train on rcnet_0.4, validate on rcnet_0.5
            # (train_ntu.py:482, val_ntu.py:399)
            rcnet_interp="rcnet_0.4", rcnet_interp_val="rcnet_0.5",
            learning_rates=(5e-5, 2e-5), learning_schedule=(10, 80)),
        eval=EvalConfig(max_depth_val=70.0),
    )
    return cfg.replace(**overrides) if overrides else cfg
