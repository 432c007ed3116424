"""Per-user path length: bucketed one-pass plan vs a row-wise oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mvt_wrangler_ray.stages.events import path_length


def _brute(df):
    out = {}
    for uid, g in df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"):
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        if len(lon) < 2:
            continue
        legs = [int(np.floor(np.sqrt((lon[i] - lon[i - 1]) ** 2 +
                                     (lat[i] - lat[i - 1]) ** 2) * 1e9))
                for i in range(1, len(lon))]
        out[int(uid)] = (sum(legs), len(legs))
    return out


def test_path_length_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype(np.int64),
        "user_id": rng.integers(0, 60, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**9, n), unit="s"),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-85, 85, n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = path_length(ds).to_pandas()
    gd = {int(r.user_id): (int(r.path_nano), int(r.n_legs))
          for r in got.itertuples()}
    assert gd == _brute(df)


def test_path_length_tie_break_by_order_col(ray_session):
    # two events at the SAME ts: leg order must follow event_id
    df = pd.DataFrame({
        "event_id": np.array([2, 1, 3], dtype=np.int64),
        "user_id": np.array([7, 7, 7], dtype=np.int64),
        "ts": pd.to_datetime([0, 0, 1], unit="s"),
        "lon": [10.0, 0.0, 10.0],
        "lat": [0.0, 0.0, 0.0]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = path_length(ds).to_pandas()
    # order by (ts, event_id): 1@(0,0) -> 2@(10,0) -> 3@(10,0)
    assert int(got["path_nano"].iloc[0]) == 10 * 10**9
    assert int(got["n_legs"].iloc[0]) == 2


def test_path_length_single_event_users_excluded(ray_session):
    df = pd.DataFrame({
        "event_id": np.arange(3, dtype=np.int64),
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "ts": pd.to_datetime([0, 1, 2], unit="s"),
        "lon": [0.0, 3.0, 5.0],
        "lat": [0.0, 4.0, 5.0]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = path_length(ds).to_pandas()
    assert set(got["user_id"]) == {1}
    assert int(got["path_nano"].iloc[0]) == 5 * 10**9
