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


def test_funnel_depth_matches_brute_force(ray_session):
    from mvt_wrangler_ray.stages.events import funnel_depth

    rng = np.random.default_rng(29)
    n = 3000
    steps = ["a", "b", "c"]
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "x"], n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = funnel_depth(ds, steps).to_pandas()
    gd = dict(zip(got["user_id"].astype(int), got["depth"].astype(int)))

    want = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        thresh = pd.Timestamp.min
        depth = 0
        for s in steps:
            q = g[(g["event_type"] == s) & (g["ts"] >= thresh)]
            if len(q) == 0:
                break
            thresh = q["ts"].min()
            depth += 1
        if depth >= 1:
            want[int(uid)] = depth
    assert gd == want
    assert {2, 3} <= set(gd.values())


def test_funnel_requires_order(ray_session):
    from mvt_wrangler_ray.stages.events import funnel_depth

    # user 1: b before a -> depth 1 (b at t0 doesn't count, no b after a)
    # user 2: a then b then c -> depth 3
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime([1, 2, 0, 1, 2], unit="s"),
        "event_type": ["b", "a", "a", "b", "c"]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = funnel_depth(ds, ["a", "b", "c"]).to_pandas()
    gd = dict(zip(got["user_id"].astype(int), got["depth"].astype(int)))
    assert gd == {1: 1, 2: 3}
