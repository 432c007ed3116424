"""mvt_wrangler_ray — a Ray-Data-native spatial-join + tiling engine.

Reimplements the query semantics of the Rust reference `mvt-wrangler`
(tile-pyramid assignment, Web-Mercator projection/clipping, spatial-mask
scoped Maplibre-style expression filtering, attribute rewriting, ordered
tile output) as streaming ``map_batches`` stages over zero-copy Arrow,
plus the large-scale training-data operators (dedup, kNN, text analysis,
image plumbing) a 100 TB pipeline needs.

Architecture (not a port): `ray.data.Dataset` pipelines, actor pools for
stateful stages, broadcast spatial joins, salted two-phase groupbys,
range-partitioned resumable sinks. Reference semantics citations point
into /root/reference (file:line).
"""

__version__ = "0.1.0"
