"""Interoperability with the reference's torch model zoo."""

from .torch_convert import (  # noqa: F401
    change_keys_of_older_models,
    load_torch_pose_checkpoint,
    pose_predictor_params_from_torch,
)
