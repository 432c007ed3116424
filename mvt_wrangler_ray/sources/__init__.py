"""Sources: the images table (parquet now, Lance when available) and a
deterministic synthesizer for tests/benchmarks (FIXTURES.md §1 schema)."""

from .images import read_images, synth_images_table, images_from_documents

__all__ = ["read_images", "synth_images_table", "images_from_documents"]
