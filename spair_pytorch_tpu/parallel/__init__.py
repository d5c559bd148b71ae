from spair_pytorch_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from spair_pytorch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from spair_pytorch_tpu.parallel.constraints import (  # noqa: F401
    set_constraint_mesh,
    model_axis_active,
    constrain,
)
