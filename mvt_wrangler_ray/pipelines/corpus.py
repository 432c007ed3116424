"""Composed training-data corpus cleaning — the kind of pipeline this
engine exists to run at 100 TB:

    read documents
      → quality scoring (vectorized Arrow kernels)
      → language ID (actor pool)
      → quality + language gates (map-side filters, no shuffle)
      → exact dedup (narrow hash shuffle, min-id survivor)
      → near-dup removal (MinHash-LSH candidates → Jaccard verify →
        union-find clusters → keep cluster minimum)
      → surviving documents

Every stage streams; the only shuffles are the two narrow dedup
exchanges. Survivor selection is by broadcast id-set semi-join, so
document payloads move zero times.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def clean_corpus(ds, min_quality: float = 0.2, langs=("en",),
                 near_dup_threshold: float = 0.7,
                 id_col: str = "doc_id", text_col: str = "text",
                 broadcast_id_limit: int = 5_000_000,
                 near_dup_pairs_limit: int = 2_000_000):
    """→ (survivors_ds, stats dict). Requires columns id_col, text_col.

    `broadcast_id_limit` is the exact-dedup plan cutover: below it the
    narrow (hash, id) aggregate's survivor ids are broadcast and payloads
    move ZERO times (the fast path); above it the survivor id set would
    not fit on the driver/workers, so dedup switches to the one-payload-
    exchange plan (stages/dedup.exact_dedup_rows) — same output, no
    driver state, the 100-TB path."""
    import ray

    from ..stages.dedup import (cluster_pairs, exact_dedup,
                                exact_dedup_rows, minhash_near_dups)
    from ..stages.events import broadcast_semi_join
    from ..stages.text import lang_id_batch, quality_score_batch

    stats = {}
    n0 = ds.count()
    stats["input"] = n0

    scored = ds.map_batches(
        lambda b: quality_score_batch(b, text_col), batch_format="pyarrow")
    scored = scored.map_batches(lang_id_batch, batch_format="pyarrow")

    lang_set = set(langs)

    def gate(batch: pa.Table) -> pa.Table:
        q = batch["quality_score"].to_numpy(zero_copy_only=False)
        pl = np.asarray(batch["predicted_lang"].to_pandas(), dtype=object)
        keep = (q >= min_quality) & np.isin(pl, list(lang_set))
        return batch.filter(pa.array(keep))

    gated = scored.map_batches(gate, batch_format="pyarrow").materialize()
    stats["after_gates"] = gated.count()

    # exact dedup: survivors = min id per content hash. Count the narrow
    # survivor pairs FIRST (an aggregate over (hash, id) — cheap) to pick
    # the plan; only the broadcast path ever collects ids.
    exact_pairs = exact_dedup(gated, col=text_col, id_col=id_col).materialize()
    n_exact = exact_pairs.count()
    stats["after_exact_dedup"] = n_exact
    if n_exact <= broadcast_id_limit:
        exact_ids = set(exact_pairs.to_pandas()[id_col].tolist())
        ref = ray.put(exact_ids)
        exact_survivors = broadcast_semi_join(gated, id_col, ref).materialize()
    else:
        exact_survivors = exact_dedup_rows(
            gated, col=text_col, id_col=id_col).materialize()

    # near-dup: cluster verified pairs, drop everything but each
    # cluster's min id. Same cutover shape as exact dedup: below
    # `near_dup_pairs_limit` the pair graph clusters on the driver
    # (union-find) and the drop set broadcasts; above it, clustering runs
    # as distributed min-label propagation to fixpoint and the drop ids
    # anti-join through one bucketed exchange — no driver state.
    pairs_ds = minhash_near_dups(exact_survivors, threshold=near_dup_threshold,
                                 col=text_col, id_col=id_col,
                                 as_dataset=True).materialize()
    n_pairs = pairs_ds.count()
    stats["near_dup_pairs"] = n_pairs
    if n_pairs == 0:
        stats["near_dup_dropped"] = 0
        survivors = exact_survivors
    elif n_pairs <= near_dup_pairs_limit:
        clusters = cluster_pairs(pairs_ds.to_pandas())
        drop = set(clusters.loc[
            clusters["doc_id"] != clusters["cluster_id"], "doc_id"].tolist())
        stats["near_dup_dropped"] = len(drop)
        dref = ray.put(drop)
        survivors = broadcast_semi_join(exact_survivors, id_col, dref,
                                        anti=True)
    else:
        from ..stages.dedup import label_propagation_converged
        from ..stages.shuffle import bucketed_key_semi_join

        labels = label_propagation_converged(pairs_ds)
        drops = labels.map_batches(
            lambda b: b.filter(pa.compute.not_equal(b["node"], b["label"])),
            batch_format="pyarrow").materialize()
        stats["near_dup_dropped"] = drops.count()
        survivors = bucketed_key_semi_join(
            exact_survivors, drops, id_col, right_key="node", anti=True)
    stats["output"] = survivors.count()
    return survivors, stats
