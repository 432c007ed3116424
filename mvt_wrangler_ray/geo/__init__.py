"""Geospatial kernels: Web-Mercator tile math, cell indexes (quadkey /
S2-style / hex), pure-numpy computational geometry (point-in-polygon,
polygon intersects), an STR-packed R-tree, and deterministic geotagging.

All kernels are vectorized over numpy arrays — these run inside
``map_batches`` on whole Arrow batches, never per row.
"""
