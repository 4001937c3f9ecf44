"""RIDERS-TPU: a TPU-native radar + thermal-camera metric depth framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the RIDERS
reference (robust metric depth from mmWave radar + monocular thermal IR):

  Stage 1  Global scale alignment of a monocular relative-depth prior
           against sparse radar returns (`riders_tpu.ops.alignment`).
  Stage 2  Quasi-dense radar augmentation: RC-Net radar-pixel
           correspondence network (`riders_tpu.models.rcnet`,
           `riders_tpu.pipelines.rcnet_inference`).
  Stage 3  Scale-map learner (SML): MiDaS-small style network regressing a
           dense per-pixel scale map (`riders_tpu.models.sml`,
           `riders_tpu.pipelines.sml_inference`).

Everything in the hot path is pure JAX (jit/vmap/shard_map); host work is
confined to IO and offline preprocessing.
"""

__version__ = "0.1.0"
