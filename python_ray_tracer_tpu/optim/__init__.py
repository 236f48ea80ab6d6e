"""Inverse rendering: parameter partitioning, losses, Adam training."""

from .params import LIGHT_PARAM_FIELDS, SPHERE_PARAM_FIELDS, Params, combine, scene_to_params
from .train import (
    TrainState,
    fit,
    init_state,
    l2_image_loss,
    make_loss_fn,
    make_train_step,
    masked_updates,
)

__all__ = [
    "LIGHT_PARAM_FIELDS",
    "SPHERE_PARAM_FIELDS",
    "Params",
    "combine",
    "scene_to_params",
    "TrainState",
    "fit",
    "init_state",
    "l2_image_loss",
    "make_loss_fn",
    "make_train_step",
    "masked_updates",
]
