from textflux_tpu.ops.packing import (  # noqa: F401
    pack_latents,
    unpack_latents,
    pack_mask,
    latent_image_ids,
    text_ids,
)
from textflux_tpu.ops.rope import rope_tables, apply_rope  # noqa: F401
from textflux_tpu.ops.samplers import (  # noqa: F401
    calculate_shift,
    make_schedule,
    euler_step,
    overshoot_step,
    scale_noise,
    sample_timestep_density,
    loss_weighting,
)
