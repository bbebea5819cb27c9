from flexam_tpu.parallel.sharding import (  # noqa: F401
    activation_sharding,
    clear_mesh,
    dit_param_shardings,
    make_mesh,
    set_mesh,
    shard_pytree,
    t5_param_shardings,
    token_constraint,
)
