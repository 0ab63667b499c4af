from stableavatar_tpu.schedulers.flow_match import (  # noqa: F401
    FlowMatchEulerSchedule,
    flow_match_timesteps,
    add_noise,
)
