from textflux_tpu.pipeline.fill import FillPipeline  # noqa: F401
from textflux_tpu.pipeline.prompts import build_prompts  # noqa: F401
