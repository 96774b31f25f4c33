from textflux_tpu.data.dataset import (  # noqa: F401
    AnyWordSingleLineDataset,
    CombinedFolderDataset,
    UnionDataset,
    PREFERRED_RESOLUTIONS,
    image_resize,
)
from textflux_tpu.data.loader import BucketedLoader  # noqa: F401
