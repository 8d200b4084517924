from vit_exp_tpu.parallel.sharding import (
    init_sharded_params,
    param_shardings,
    make_train_mesh_context,
)
