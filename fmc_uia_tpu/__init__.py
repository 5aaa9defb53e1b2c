"""fmc_uia_tpu — TPU-native multi-task ultrasound image analysis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
HJJ-D/Foundation-Model-Challenge-for-Ultrasound-Image-Analysis (MTUS-Net):
a config-driven multi-task learning framework covering 27 ultrasound subtasks
across 4 task types (segmentation, classification, detection, keypoint
regression) with a shared encoder, per-task-type FPN decoders and per-subtask
heads.

TPU-first design decisions (vs. the single-GPU PyTorch reference):
  * One jit-compiled train step per task TYPE (4 total) — per-subtask heads
    are banked parameter stacks indexed by a device-side task index, so all
    27 subtasks share 4 compiled programs instead of 27 eager dispatches.
  * NHWC layout, bfloat16 compute / float32 params by default.
  * Host does image decode + geometric resize (fixed shapes for XLA);
    photometric augmentation + normalization run fused on device.
  * CenterNet target synthesis is a vectorized device computation
    (reference: Python per-sample loop, train.py:366-398).
  * Data parallelism over ICI via jax.sharding.Mesh + NamedSharding.
"""

__version__ = "0.1.0"

from fmc_uia_tpu.config import Config, load_config
from fmc_uia_tpu.tasks import TaskRegistry, TaskSpec, TASK_TYPES

__all__ = [
    "Config",
    "load_config",
    "TaskRegistry",
    "TaskSpec",
    "TASK_TYPES",
    "__version__",
]
