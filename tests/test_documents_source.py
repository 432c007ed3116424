"""Multi-format documents ingest (sources/documents.py): JSONL and CSV
must normalize to the same canonical table the parquet read produces."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mvt_wrangler_ray.sources.documents import (normalize_documents_batch,
                                                read_documents)

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs_df():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values(
        "doc_id").reset_index(drop=True)


def _canon(ds):
    return ds.to_pandas()[["doc_id", "text"]].sort_values(
        "doc_id").reset_index(drop=True)


def test_jsonl_roundtrip_matches_parquet(tmp_path, docs_df, ray_session):
    p = tmp_path / "docs.jsonl"
    docs_df.to_json(p, orient="records", lines=True)
    got = _canon(read_documents(str(p)))
    pd.testing.assert_frame_equal(got, docs_df)


def test_csv_roundtrip_matches_parquet(tmp_path, docs_df, ray_session):
    p = tmp_path / "docs.csv"
    docs_df.to_csv(p, index=False)
    got = _canon(read_documents(str(p)))
    pd.testing.assert_frame_equal(got, docs_df)


def test_parquet_passthrough_with_columns(ray_session):
    got = _canon(read_documents(f"{SF_DIR}/documents.parquet",
                                columns=["doc_id", "text"]))
    want = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_downstream_operator_runs_on_jsonl(tmp_path, docs_df, ray_session):
    # the point of normalization: any engine operator runs unchanged
    from mvt_wrangler_ray.stages.curate import split_stats

    p = tmp_path / "docs.jsonl"
    docs_df.to_json(p, orient="records", lines=True)
    out = split_stats(read_documents(str(p))).to_pandas()
    assert out["n_docs"].sum() == len(docs_df)


def test_normalizer_missing_column_raises():
    t = pa.table({"doc_id": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="required columns missing"):
        normalize_documents_batch(t)


def test_normalizer_casts_int32_ids():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int32()),
                  "text": pa.array(["a", "b"], pa.string())})
    out = normalize_documents_batch(t)
    assert pa.types.is_int64(out["doc_id"].type)


def test_normalizer_lossy_id_cast_raises():
    t = pa.table({"doc_id": pa.array([1.5], pa.float64()),
                  "text": pa.array(["a"], pa.string())})
    with pytest.raises(Exception):
        normalize_documents_batch(t)


def test_unsupported_extension_raises():
    with pytest.raises(ValueError, match="unsupported extension"):
        read_documents("/tmp/docs.xml")


def test_gzip_jsonl_roundtrip(tmp_path, docs_df, ray_session):
    import gzip

    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wb") as f:
        f.write(docs_df.to_json(orient="records", lines=True).encode())
    got = _canon(read_documents(str(p)))
    pd.testing.assert_frame_equal(got, docs_df)
