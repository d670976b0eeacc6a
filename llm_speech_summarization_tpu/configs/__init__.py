from .config import (
    AudioConfig,
    AudioEncoderConfig,
    Config,
    DataConfig,
    LogConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    PoolingConfig,
    TrainConfig,
    load_config,
)

__all__ = [
    "AudioConfig",
    "AudioEncoderConfig",
    "Config",
    "DataConfig",
    "LogConfig",
    "MeshConfig",
    "ModelConfig",
    "OptimizerConfig",
    "PoolingConfig",
    "TrainConfig",
    "load_config",
]
