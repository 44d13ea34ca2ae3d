"""Inference API: PoseEstimator + configuration + detection types."""

from .pose_estimator import PoseEstimator  # noqa: F401
from .types import InferenceConfig, make_detections, make_pose_estimates  # noqa: F401
