from bokego_tpu.models.nets import (
    PolicyNet,
    PolicyNetV2,
    UntiedBiasConv,
    ValueNet,
    init_policy,
    init_value,
    value_from_policy,
)
from bokego_tpu.models import convert, inference

__all__ = [
    "PolicyNet",
    "PolicyNetV2",
    "ValueNet",
    "UntiedBiasConv",
    "init_policy",
    "init_value",
    "value_from_policy",
    "convert",
    "inference",
]
