from .sharding import (  # noqa: F401
    AXIS_DATA,
    AXIS_GALLERY,
    build_mesh,
    gallery_sharding,
    replicated,
    batch_sharding,
)
from .topk import distributed_top1, distributed_topk  # noqa: F401
