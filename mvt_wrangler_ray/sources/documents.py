"""Multi-format documents ingest — web corpora arrive as JSONL and CSV
at least as often as Parquet; this source normalizes all three into the
engine's canonical documents shape so every downstream operator
(dedup, funnel, packing, splits) runs unchanged.

Canonical schema: ``doc_id:int64, text:string`` plus passthrough
columns. The normalizer is a map_batches stage (streaming, no
materialization): it validates the required columns exist, casts
``doc_id`` to int64 and ``text`` to string (both loud failures — a
silently-lossy cast on ids corrupts every downstream join), and
preserves extra columns unless ``columns=`` prunes them.

Format dispatch is by extension; directories dispatch on their files.
Ray Data's readers handle gzip transparently (``.jsonl.gz`` etc. via
the Arrow filesystem layer).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

_READERS = {
    ".parquet": "read_parquet",
    ".jsonl": "read_json",
    ".json": "read_json",
    ".csv": "read_csv",
}


def _format_of(path: str) -> str:
    base = path.rstrip("/")
    if os.path.isdir(base):
        exts = {os.path.splitext(f)[1] for f in os.listdir(base)
                if not f.startswith((".", "_"))}
        exts = {e for e in exts if e in _READERS}
        if len(exts) != 1:
            raise ValueError(
                f"read_documents: directory {path} must hold exactly one "
                f"supported format, found {sorted(exts) or 'none'}")
        return exts.pop()
    name = base[:-3] if base.endswith(".gz") else base
    ext = os.path.splitext(name)[1]
    if ext not in _READERS:
        raise ValueError(
            f"read_documents: unsupported extension {ext!r} on {path} "
            f"(supported: {sorted(_READERS)})")
    return ext


def normalize_documents_batch(batch: pa.Table,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> pa.Table:
    """Validate + cast one batch into the canonical documents shape."""
    missing = [c for c in (id_col, text_col) if c not in batch.column_names]
    if missing:
        raise ValueError(
            f"documents source: required columns missing: {missing} "
            f"(have {batch.column_names})")
    ids = batch[id_col]
    if not pa.types.is_int64(ids.type):
        # safe=True: a float or decimal id that doesn't round-trip raises
        ids = pc.cast(ids, pa.int64(), safe=True)
    txt = batch[text_col]
    if not pa.types.is_string(txt.type):
        if pa.types.is_large_string(txt.type):
            txt = pc.cast(txt, pa.string())
        else:
            raise ValueError(
                f"documents source: {text_col} must be a string column, "
                f"got {txt.type}")
    out = batch.set_column(batch.schema.get_field_index(id_col), id_col, ids)
    return out.set_column(out.schema.get_field_index(text_col), text_col, txt)


def read_documents(path: str, columns: Optional[Sequence[str]] = None,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Read a documents table from Parquet, JSONL, or CSV (file or
    directory), normalized to the canonical schema.

    Parquet prunes ``columns`` at the read (row-group projection); the
    row-based formats read whole records and prune post-parse (their
    storage layout cannot project — convert to Parquet for the 100-TB
    path; this reader exists for the ingest hop).
    """
    import ray.data as rd

    fmt = _format_of(path)
    reader = getattr(rd, _READERS[fmt])
    ds = reader(path, columns=list(columns)) if (
        columns and fmt == ".parquet") else reader(path)

    def norm(batch: pa.Table) -> pa.Table:
        t = normalize_documents_batch(batch, id_col, text_col)
        if columns:
            t = t.select(list(columns))
        return t

    return ds.map_batches(norm, batch_format="pyarrow")
