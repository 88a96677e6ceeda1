from icka_tpu.core.config import (
    EncoderConfig,
    ICKAConfig,
    GateCLConfig,
    TrainConfig,
    DataConfig,
)
from icka_tpu.core.mesh import MeshSpec, make_mesh, data_sharding, replicated
from icka_tpu.core.dtypes import DTypePolicy

__all__ = [
    "EncoderConfig",
    "ICKAConfig",
    "GateCLConfig",
    "TrainConfig",
    "DataConfig",
    "MeshSpec",
    "make_mesh",
    "data_sharding",
    "replicated",
    "DTypePolicy",
]
