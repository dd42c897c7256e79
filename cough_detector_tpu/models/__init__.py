"""Flax classifier family + reference-checkpoint conversion."""

from .classifiers import (
    CoughDetector,
    CoughDetectorResidual,
    CoughDetectorSmall,
    count_parameters,
    create_model,
    init_model,
    model_from_config,
    predict,
)
from .convert import (
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)
from .layers import BatchNorm, ConvBlock, ResidualBlock, SeparableBlock

__all__ = [
    "CoughDetector",
    "CoughDetectorResidual",
    "CoughDetectorSmall",
    "count_parameters",
    "create_model", "model_from_config",
    "init_model",
    "predict",
    "torch_state_dict_to_variables",
    "variables_to_torch_state_dict",
    "BatchNorm",
    "ConvBlock",
    "ResidualBlock",
    "SeparableBlock",
]
