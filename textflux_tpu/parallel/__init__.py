from textflux_tpu.parallel.partitioning import (  # noqa: F401
    MESH_AXES,
    make_mesh,
    flux_param_specs,
    batch_spec,
    shard_tree,
    replicate_tree,
)
