from terrain_diffusion_tpu.scheduler.dpmsolver import (  # noqa: F401
    EDMSchedulerConfig,
    compute_sigmas,
    precondition_inputs,
    precondition_noise,
    precondition_outputs,
    trigflow_precondition_noise,
    sample_dpm,
    add_noise,
    scale_score_in_velocity,
)
