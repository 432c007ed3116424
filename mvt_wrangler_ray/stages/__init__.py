"""Ray Data stages. Stateless kernels are plain functions over
``pyarrow.Table`` batches (cheap elastic tasks); stateful stages are
callable classes for ``map_batches(Cls, concurrency=...)`` actor pools
(state built once per actor in ``__init__``)."""

from .geospatial import geotag_batch, cell_encode_batch, tile_assign_batch, pyramid_assign_batch
from .filter_join import FilterJoinStage
from .tile_encode import encode_tile_group, tile_counts_two_phase, top_k_tiles

__all__ = [
    "geotag_batch", "cell_encode_batch", "tile_assign_batch",
    "pyramid_assign_batch", "FilterJoinStage", "encode_tile_group",
    "tile_counts_two_phase", "top_k_tiles",
]
