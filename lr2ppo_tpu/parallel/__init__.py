from lr2ppo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_params,
    shard_opt_state,
    shard_optimizer,
    opt_state_shardings,
    put_batch,
    put_global,
    global_put,
    fetch_global,
)
