"""rspl_slam_tpu — TPU-native stereo point-line SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
AirVO-derived RSPL-SLAM reference (stereo visual odometry with SuperPoint
keypoints, SuperGlue graph matching, RCF-edge-driven line features, and
point/line local bundle adjustment), built TPU-first:

- fixed-shape, masked, batched arrays instead of per-frame dynamic shapes
- functional map state (struct-of-arrays) updated by jitted steps
- Levenberg–Marquardt solvers (pose-only and Schur-complement local BA)
  written directly in JAX instead of g2o
- pjit/shard_map over a device mesh instead of a single-GPU mutex pipeline

Reference behavior contract: see SURVEY.md §2.3 in the repo root.
"""

__version__ = "0.1.0"

from rspl_slam_tpu.config import (  # noqa: F401
    CameraConfig,
    KeyframeConfig,
    LineDetectorConfig,
    OptimizationConfig,
    PipelineConfig,
    SuperGlueConfig,
    SuperPointConfig,
    SystemConfig,
    load_system_config,
)
