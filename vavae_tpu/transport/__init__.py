from vavae_tpu.transport.transport import (
    ModelType,
    PathType,
    Transport,
    WeightType,
    create_transport,
)
from vavae_tpu.transport.sampler import Sampler

__all__ = [
    "ModelType",
    "PathType",
    "Transport",
    "WeightType",
    "create_transport",
    "Sampler",
]
