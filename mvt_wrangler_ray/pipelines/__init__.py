"""Composed pipelines: the flagship wrangle (geotag → cells → tiles →
filter-join → tile encode/aggregate) and the reference-shaped
features-table transform."""
