from textflux_tpu.io.params import (  # noqa: F401
    convert_flux_state_dict,
    load_safetensors_dir,
    load_flux_transformer,
)
