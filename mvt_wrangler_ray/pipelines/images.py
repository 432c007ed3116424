"""Composed image-corpus curation — the image-axis analog of
pipelines/corpus.clean_corpus:

    read images
      → size/aspect gate (integer compares on metadata columns —
        payloads untouched, stages/image.size_filter_verdict_batch)
      → decode + recomputed phash (actor-shaped map_batches; pixels
        never leave the stage)
      → phash Hamming-band near-dup pairs (dedup.hamming_near_dups —
        banded LSH with complete recall at max_hamming ≤ bands-1)
      → drop the higher id of each verified pair among gate survivors
      → surviving images

Every stage streams; the only exchanges are the banded candidate
shuffle inside hamming_near_dups and one bucketed anti join for the
drop set (no driver id-set residence beyond the pair list, which is
bounded by the verified near-dup count — the same documented bound as
the dedup_clusters family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def clean_images(ds_images, min_side: int = 48, max_side: int = 112,
                 max_aspect: int = 2, max_hamming: int = 7,
                 bands: int = 8, id_col: str = "doc_id",
                 strict: bool | None = None):
    """→ (survivors_ds, stats dict). Requires the canonical images
    schema (sources/images): id_col, bytes, w, h plus metadata.

    Drop policy: among size-gate survivors, the HIGHER id of each
    verified near-dup pair is dropped (the planted-copy convention:
    copies carry the higher id). For general cluster graphs use
    stages/curate.cluster_representatives to pick quality-aware
    survivors instead.
    """
    import ray.data as rd

    from ..stages.dedup import hamming_near_dups
    from ..stages.image import (DecodeImageStage, size_filter_verdict_batch,
                                strict_codecs_default)
    from ..stages.shuffle import bucketed_key_semi_join

    stats = {}
    stats["input"] = ds_images.count()

    def gate(b: pa.Table) -> pa.Table:
        t = size_filter_verdict_batch(b, min_side, max_side, max_aspect)
        t = t.filter(pa.compute.equal(t["verdict"], "ok"))
        return t.drop_columns(["verdict"])

    gated = ds_images.map_batches(gate, batch_format="pyarrow").materialize()
    stats["after_size_gate"] = gated.count()

    _strict = strict_codecs_default() if strict is None else strict
    _cache: dict = {}

    def decode(b: pa.Table) -> pa.Table:
        st = _cache.get("s")
        if st is None:
            st = _cache["s"] = DecodeImageStage(strict=_strict)
        return st(b).select([id_col, "phash_recomputed"])

    sig = gated.map_batches(decode, batch_format="pyarrow", batch_size=1024)
    pairs = hamming_near_dups(sig, "phash_recomputed",
                              max_hamming=max_hamming, bands=bands)
    stats["near_dup_pairs"] = len(pairs)
    if len(pairs) == 0:
        stats["near_dup_dropped"] = 0
        stats["output"] = stats["after_size_gate"]
        return gated, stats

    drop = pairs[["id_b"]].drop_duplicates()
    stats["near_dup_dropped"] = len(drop)
    drop_ds = rd.from_pandas(drop)
    survivors = bucketed_key_semi_join(gated, drop_ds, id_col,
                                       right_key="id_b", anti=True)
    survivors = survivors.materialize()
    stats["output"] = survivors.count()
    return survivors, stats
