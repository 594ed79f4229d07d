from vlp_tpu.config.core import (  # noqa: F401
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    SchedulerConfig,
    TrainerConfig,
    apply_overrides,
    get_experiment,
    list_experiments,
    register_experiment,
)

# Importing registers the built-in experiment matrix.
from vlp_tpu.config import experiments as _experiments  # noqa: F401,E402
