from rspl_slam_tpu.geometry import se3, plucker, triangulation  # noqa: F401
