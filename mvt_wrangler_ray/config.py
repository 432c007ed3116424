"""Engine configuration — the analogue of the reference CLI surface
(/root/reference/src/lib.rs:12-37) plus the graft's tiling/cell knobs."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class EngineConfig:
    # tiling
    zoom: int = 12                 # index zoom for single-level assignment
    zoom_range: Tuple[int, int] = (9, 15)  # pyramid range (reference fixture is z9–z15)
    extent: int = 4096             # tile-local grid (transform.rs:94 default)

    # input shape (BASELINE.json input_hint)
    id_col: str = "image_id"
    tag_cols: List[str] = field(default_factory=lambda: ["caption", "fmt", "w", "h", "phash"])
    layer_col: Optional[str] = None   # column holding the layer name, if any
    default_layer: str = "images"     # layer used when layer_col is None

    # cells
    hex_res: int = 7
    s2_level: int = 12
    prefix_bits: int = 12          # cell-prefix range partitioning key width

    # skew handling
    salt_buckets: int = 16         # two-phase groupby salt fan-out

    # metadata overrides (metadata.rs:7-35)
    name: Optional[str] = None
    description: Optional[str] = None
    attribution: Optional[str] = None

    # execution
    batch_size: int = 65536
    filter_concurrency: Tuple[int, int] = (2, 8)


def apply_metadata_overrides(base: dict | str | None, cfg: EngineConfig) -> dict:
    """TileJSON-ish override merge — /root/reference/src/metadata.rs:7-35:
    invalid/non-object base falls back to {}; name/description/attribution
    overwrite when provided."""
    import json

    meta: dict = {}
    if isinstance(base, str):
        try:
            parsed = json.loads(base)
            meta = parsed if isinstance(parsed, dict) else {}
        except (ValueError, TypeError):
            meta = {}
    elif isinstance(base, dict):
        meta = dict(base)
    if cfg.name is not None:
        meta["name"] = cfg.name
    if cfg.description is not None:
        meta["description"] = cfg.description
    if cfg.attribution is not None:
        meta["attribution"] = cfg.attribution
    return meta
