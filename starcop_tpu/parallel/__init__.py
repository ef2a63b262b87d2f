"""Device-mesh parallelism: data-parallel training and column-sharded scenes."""

from starcop_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from starcop_tpu.parallel.scene_mag1c import sharded_mag1c_scene  # noqa: F401
