from flexam_tpu.sampling.flow_match import (  # noqa: F401
    ScheduleTables,
    add_noise,
    build_schedule,
    make_sampler,
)
