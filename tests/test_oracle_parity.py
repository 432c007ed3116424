"""Driver-gate simulation: run every __ray_entry__ query at sf0.001 and
compare to its DuckDB oracle — row count, column names, and
order-insensitive value equality (the same comparison shape the driver
applies at sf0.01). Rows-only queries are smoke-checked for shape and
determinism."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = __import__("os").environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


SQL_QUERIES = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(SQL_QUERIES))


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, con, ray_session):
    q = entrymod.queries()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        gv, wv = got[c].to_numpy(), want[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            # the driver hashes values EXACTLY — float columns must be
            # bit-identical (queries discretize with identical IEEE ops
            # on both sides precisely so this holds)
            assert np.array_equal(gv.astype(np.float64),
                                  wv.astype(np.float64), equal_nan=True), \
                f"{name}.{c} not bit-exact (max diff " \
                f"{np.max(np.abs(gv.astype(np.float64) - wv.astype(np.float64)))})"
        else:
            assert (gv == wv).all(), f"{name}.{c} value mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY or ["<empty>"])
def test_rows_only_queries_run(name, ray_session):
    if name == "<empty>":
        pytest.skip(
            "every registered query has a SQL oracle, so the weaker "
            "rows-only lane is empty — this skip IS the expected state "
            "(it would only run if an oracle-less query were added)")
    q = entrymod.queries()[name]
    got = _to_pandas(q(SF_DIR))
    assert len(got) >= 0 and len(got.columns) >= 1


def test_entry_smoke(ray_session):
    out = _to_pandas(entrymod.entry())
    assert len(out) > 0
    assert "n_images" in out.columns


def test_every_query_has_an_oracle():
    """The driver contract: queries() and oracle_sql() keys must match
    exactly — a query without an oracle silently downgrades to a
    rows-only check; an oracle without a query is dead SQL."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (f"queries without oracle: {sorted(q - o)}; "
                    f"oracles without query: {sorted(o - q)}")
