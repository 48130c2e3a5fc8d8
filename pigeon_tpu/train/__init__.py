"""Training engine: mesh/sharding, pjit train+eval steps, checkpoints, metrics."""

from pigeon_tpu.train.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    fsdp_param_specs,
    opt_state_specs,
    shard_batch,
    shard_params,
    sharding_rules,
)
from pigeon_tpu.train.train_loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    state_shardings,
)
