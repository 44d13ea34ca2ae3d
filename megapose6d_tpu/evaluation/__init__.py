"""Evaluation: BOP CSV bridge, meters, prediction/evaluation runners."""

from .bop import convert_results_to_bop, load_bop_results, run_bop_evaluation  # noqa: F401
from .meters import Meter, ModelNetErrorMeter, compute_errors, one_to_one_matching  # noqa: F401
from .runner import EvaluationRunner, PredictionRunner, shard_frames  # noqa: F401
