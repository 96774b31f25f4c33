from textflux_tpu.models.transformer import (  # noqa: F401
    init_flux_params,
    flux_apply,
    flux_mods,
    flux_param_count,
    flux_vec,
)
