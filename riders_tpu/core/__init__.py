from riders_tpu.core.config import (
    AlignmentConfig,
    DatasetConfig,
    EvalConfig,
    RCNetConfig,
    RCNetTrainConfig,
    RidersConfig,
    SMLConfig,
    SMLTrainConfig,
    ntu_config,
    zju_config,
)
