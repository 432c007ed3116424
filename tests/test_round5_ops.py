"""Round-5 operator tests: knn exact-lane memory bound (verdict item 1),
then the new training-data-chain operators (sequence packing, mixture
upsampling, URL/domain dedup) as they land."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


# ---- verdict item 1: exact-lane self-join transient is bounded --------


def test_chunk_rows_bound_holds():
    # the contract: rows * corpus_n <= chunk_entries whenever rows > 1,
    # and rows >= 1 always (degenerate corpora never deadlock the loop)
    from mvt_wrangler_ray.stages.knn import _chunk_rows

    for chunk_entries in (1, 64, 1 << 16, 1 << 24):
        for corpus_n in (1, 7, 1024, 500_000, 10_000_000):
            rows = _chunk_rows(chunk_entries, corpus_n)
            assert rows >= 1
            if rows > 1:
                assert rows * corpus_n <= chunk_entries
    # the default bound at the default broadcast_limit: a 500k-row
    # corpus gets 33-row chunks -> sims transient 33 x 500k x 8 B
    # = 126 MiB per task (vs 4 GiB for a default 1024-row batch)
    rows = _chunk_rows(1 << 24, 500_000)
    assert rows * 500_000 * 8 <= (1 << 24) * 8 == 128 << 20


def test_knn_self_graph_chunked_equals_unchunked(ray_session):
    # chunk_entries small enough to force MANY chunks per batch: results
    # must be row-for-row identical to the single-matmul plan
    rng = np.random.default_rng(7)
    n, d, k = 50, 6, 3
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(rng.normal(size=(n, d)))})
    from mvt_wrangler_ray.stages.knn import knn_self_graph

    a = (knn_self_graph(rd.from_pandas(df), k=k)
         .to_pandas().sort_values(["vec_id", "nn_rank"])
         .reset_index(drop=True))
    b = (knn_self_graph(rd.from_pandas(df), k=k, chunk_entries=64)
         .to_pandas().sort_values(["vec_id", "nn_rank"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---- verdict item 4: mixture UPSAMPLING via replication ---------------


def test_mixture_upsample_quota_property(ray_session):
    # per-group output count equals the UNCAPPED quota exactly; each
    # row of group g appears quota//n or quota//n + 1 times; the extra
    # copy goes to the splitmix head; rep indices are 0..copies-1
    from mvt_wrangler_ray.stages.shuffle import _splitmix, mixture_resample

    rng = np.random.default_rng(29)
    sizes = {f"g{i}": int(rng.integers(1, 30)) for i in range(6)}
    weights = {f"g{i}": int(rng.integers(0, 20)) for i in range(6)}
    rows = []
    nid = 0
    for g, sz in sizes.items():
        for _ in range(sz):
            rows.append((nid, g)); nid += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    out = mixture_resample(rd.from_pandas(df), "source", weights,
                           "doc_id", budget_den=1,
                           upsample=True).to_pandas()
    assert list(out.columns) == ["doc_id", "source", "rep"]
    total = len(df); budget = total
    sw = sum(weights.get(g, 0) for g in sizes) or 1
    for g, sz in sizes.items():
        quota = budget * weights.get(g, 0) // sw
        mine = out[out["source"] == g]
        assert len(mine) == quota, (g, len(mine), quota)
        ids = df[df["source"] == g]["doc_id"].to_numpy(np.uint64)
        order = np.lexsort((ids, _splitmix(ids)))
        base, extra = quota // sz, quota % sz
        per = mine.groupby("doc_id").size()
        for rank, did in enumerate(ids[order].astype(np.int64)):
            want = base + (1 if rank < extra else 0)
            assert per.get(did, 0) == want, (g, did, rank)
            if want:
                reps = sorted(mine[mine["doc_id"] == did]["rep"])
                assert reps == list(range(want))
    # determinism across bucket counts (the shuffle width must not
    # change the sample)
    out2 = mixture_resample(rd.from_pandas(df), "source", weights,
                            "doc_id", budget_den=1, upsample=True,
                            num_buckets=3).to_pandas()
    a = out.sort_values(["doc_id", "rep"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "rep"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["doc_id", "source", "rep"]],
                                  b[["doc_id", "source", "rep"]])


def test_mixture_upsample_degenerates_to_downsample_head(ray_session):
    # when every quota <= n, upsample=True picks the SAME rows as the
    # downsample path, all with rep = 0
    from mvt_wrangler_ray.stages.shuffle import mixture_resample

    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "source": ["a"] * 20 + ["b"] * 20})
    w = {"a": 1, "b": 3}
    down = (mixture_resample(rd.from_pandas(df), "source", w, "doc_id")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    up = (mixture_resample(rd.from_pandas(df), "source", w, "doc_id",
                           upsample=True)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (up["rep"] == 0).all()
    pd.testing.assert_frame_equal(down, up[["doc_id", "source"]])


def test_temperature_weights():
    from mvt_wrangler_ray.stages.shuffle import temperature_weights

    counts = {"en": 1_000_000, "sw": 1_000}
    w1 = temperature_weights(counts, alpha=1.0)
    wa = temperature_weights(counts, alpha=0.3)
    # alpha=1 keeps the raw proportions; alpha<1 up-weights the
    # low-resource group (relative weight strictly increases)
    assert w1["sw"] / w1["en"] < wa["sw"] / wa["en"]
    assert wa["sw"] >= 1 and wa["en"] >= 1
    # deterministic and pure-int
    assert temperature_weights(counts, alpha=0.3) == wa
    assert all(isinstance(v, int) for v in wa.values())
    assert temperature_weights({}) == {}


# ---- verdict item 6: CLI defaults to STRICT codecs --------------------


def test_images_cli_strict_by_default(ray_session, tmp_path):
    # the synthetic fixture payloads are magic+body fakes the real
    # codecs can't parse: the decoding CLI path (--lossy-recode) must
    # FAIL LOUDLY by default and only run under --allow-fake-codecs
    import pyarrow.parquet as _pq
    import pytest as _pytest

    from mvt_wrangler_ray.__main__ import main
    from mvt_wrangler_ray.sources.images import synth_images_table

    inp = str(tmp_path / "imgs.parquet")
    _pq.write_table(synth_images_table(64).drop_columns(
        ["geo_hint_lon", "geo_hint_lat"]), inp)
    with _pytest.raises(Exception, match="strict codec mode"):
        main(["images", inp, str(tmp_path / "strict_out"), "-z", "8",
              "-p", "2", "--lossy-recode", "2"])
    rc = main(["images", inp, str(tmp_path / "fake_out"), "-z", "8",
               "-p", "2", "--lossy-recode", "2", "--allow-fake-codecs"])
    assert rc == 0


def test_knn_self_graph_bytes_limit_cuts_to_ivf(ray_session):
    # a wide-embedding corpus whose n x dim x 8 exceeds the bytes limit
    # must take the IVF lane even though n <= broadcast_limit; with
    # nprobe = ncentroids the IVF lane is exact, so the output still
    # matches the broadcast lane row for row
    rng = np.random.default_rng(13)
    n, d, k = 40, 16, 2
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(rng.normal(size=(n, d)))})
    from mvt_wrangler_ray.stages.knn import knn_self_graph

    a = (knn_self_graph(rd.from_pandas(df), k=k)
         .to_pandas().sort_values(["vec_id", "nn_rank"])
         .reset_index(drop=True))
    # n*d*8 = 5120 bytes > 1024 -> IVF; exact because nprobe=ncentroids
    b = (knn_self_graph(rd.from_pandas(df), k=k,
                        broadcast_bytes_limit=1024,
                        ncentroids=4, nprobe=4)
         .to_pandas().sort_values(["vec_id", "nn_rank"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["vec_id", "nn_rank", "nn_id"]],
                                  b[["vec_id", "nn_rank", "nn_id"]])


# ---- verdict item 3: sequence packing ---------------------------------


def _naive_pack(texts, ids, seq_len):
    """Single-node reference plan: one concatenated token stream,
    segments cut at seq_len boundaries."""
    rows, pos = [], 0
    order = np.argsort(ids, kind="stable")
    for i in order:
        n = len((texts[i] or "").split())
        if n == 0:
            continue
        start, end = pos, pos + n
        pos = end
        s = start
        while s < end:
            seq = s // seq_len
            hi = min(end, (seq + 1) * seq_len)
            rows.append((seq, int(ids[i]), s - seq * seq_len,
                         hi - seq * seq_len))
            s = hi
    return pd.DataFrame(rows, columns=["seq_id", "doc_id",
                                       "tok_start", "tok_end"])


def test_pack_sequences_matches_naive_and_conserves(ray_session):
    from mvt_wrangler_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(31)
    n, L = 200, 16
    texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 40)))
             for _ in range(n)]
    texts[3] = ""          # empty doc -> no segment
    texts[7] = "   "       # whitespace-only -> 0 tokens
    ids = rng.permutation(np.arange(0, 3 * n, 3, dtype=np.int64))  # sparse ids
    df = pd.DataFrame({"doc_id": ids, "text": [texts[i] for i in range(n)]})

    got = (pack_sequences(rd.from_pandas(df), seq_len=L, bucket_ids=37)
           .to_pandas().sort_values(["seq_id", "doc_id"])
           .reset_index(drop=True))
    want = (_naive_pack([texts[i] for i in range(n)], ids, L)
            .sort_values(["seq_id", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))

    # conservation: segment tokens sum to the corpus token count
    total = sum(len(t.split()) for t in texts)
    assert int((got["tok_end"] - got["tok_start"]).sum()) == total
    # every sequence except the last is exactly full
    per_seq = got.groupby("seq_id").apply(
        lambda g: int((g["tok_end"] - g["tok_start"]).sum()),
        include_groups=False)
    assert (per_seq.iloc[:-1] == L).all()
    assert 0 < per_seq.iloc[-1] <= L
    # bucket width must not change the result (distributed prefix sum
    # is exact regardless of partitioning)
    got2 = (pack_sequences(rd.from_pandas(df), seq_len=L, bucket_ids=1024)
            .to_pandas().sort_values(["seq_id", "doc_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  got2.astype(np.int64))


def test_pack_sequences_boundaries_reset_attention(ray_session):
    # a doc longer than seq_len spans sequences with tok_start == 0 on
    # continuation rows; a new doc mid-sequence starts at the previous
    # doc's tok_end
    from mvt_wrangler_ray.stages.pack import pack_sequences

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a " * 10, "b " * 3, "c " * 7]})  # 10, 3, 7 tokens; L=8
    got = (pack_sequences(rd.from_pandas(df), seq_len=8)
           .to_pandas().sort_values(["seq_id", "tok_start"])
           .reset_index(drop=True))
    want = pd.DataFrame(
        {"seq_id": [0, 1, 1, 1, 2],
         "doc_id": [1, 1, 2, 3, 3],
         "tok_start": [0, 0, 2, 5, 0],
         "tok_end": [8, 2, 5, 8, 4]})
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want.astype(np.int64))


# ---- verdict item 5: URL/domain dedup + mixing stats -------------------


def test_registered_domain_normalizer_branches():
    import pyarrow as pa

    from mvt_wrangler_ray.stages.web import registered_domain_batch

    t = pa.table({"url": [
        "HTTPS://WWW.Site1.COM:443/p/1?q=x",   # case + port + www
        "http://blog.site2.co.uk/p/2",          # two-level suffix -> 3 labels
        "https://a.b.site3.ac.jp/p/3#frag",     # deep sub + 2-level suffix
        "https://site4.org/p/4",                # bare 2-label host
        "https://localhost/p/5",                # single label: pass through
        "https://cdn.site6.net:8080/p/6",       # nonstandard port
    ]})
    got = registered_domain_batch(t)["domain"].to_pylist()
    assert got == ["site1.com", "site2.co.uk", "site3.ac.jp",
                   "site4.org", "localhost", "site6.net"]


def test_domain_cap_keeps_lowest_ids(ray_session):
    from mvt_wrangler_ray.stages.web import (domain_cap_dedup,
                                             registered_domain_batch,
                                             synth_url_batch)

    ids = np.arange(500, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids})).map_batches(
        synth_url_batch, batch_format="pyarrow")
    out = domain_cap_dedup(ds, cap=2).to_pandas()
    # ground truth from the batch normalizer
    import pyarrow as pa

    full = registered_domain_batch(
        synth_url_batch(pa.table({"doc_id": pa.array(ids)}))).to_pandas()
    want = (full.sort_values("doc_id").groupby("domain").head(2)
            [["doc_id", "domain"]])
    got = out.sort_values(["domain", "doc_id"]).reset_index(drop=True)
    want = want.sort_values(["domain", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert out.groupby("domain").size().max() <= 2
    # bucket width must not change survivors
    out2 = domain_cap_dedup(ds, cap=2, num_buckets=7).to_pandas()
    got2 = out2.sort_values(["domain", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)


def test_domain_stats_feed_temperature_weights(ray_session):
    # the composition the module exists for: stats -> mixture weights
    from mvt_wrangler_ray.stages.shuffle import temperature_weights
    from mvt_wrangler_ray.stages.web import domain_stats, synth_url_batch

    ids = np.arange(300, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": ids, "n_chars": (ids % 50 + 1).astype(np.int64)})
    ).map_batches(synth_url_batch, batch_format="pyarrow")
    stats = domain_stats(ds).to_pandas()
    assert int(stats["n_docs"].sum()) == 300
    assert set(stats.columns) == {"domain", "n_docs", "total_chars"}
    w = temperature_weights(
        dict(zip(stats["domain"], stats["n_docs"])), alpha=0.3)
    assert len(w) == len(stats) and all(v >= 1 for v in w.values())


def test_canonicalize_url_branches():
    import pyarrow as pa

    from mvt_wrangler_ray.stages.web import canonicalize_url_batch

    t = pa.table({"url": [
        "HTTPS://Site.COM:443/p/1?utm_source=x&ref=k#f",  # case+defport+utm+frag
        "http://x.org:80/p",                    # http default port
        "https://y.net:8080/p",                 # nonstandard port kept
        "https://z.io/p/?utm_a=1",              # trailing slash + only-utm query
        "https://z.io/",                        # root slash... trimmed to host
        "not a url at all",                     # no match -> null
        "https://q.co/p?a=1&utm_x=2&b=3",       # utm mid-query removed
    ]})
    got = canonicalize_url_batch(t)["url_canon"].to_pylist()
    assert got == [
        "https://site.com/p/1?ref=k",
        "http://x.org/p",
        "https://y.net:8080/p",
        "https://z.io/p",
        "https://z.io",
        None,
        "https://q.co/p?a=1&b=3",
    ]


def test_url_exact_dedup_groups(ray_session):
    from mvt_wrangler_ray.stages.web import synth_dup_url_batch, url_exact_dedup

    ids = np.arange(500, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids})).map_batches(
        synth_dup_url_batch, batch_format="pyarrow")
    out = url_exact_dedup(ds).to_pandas()
    assert int(out["n_dups"].sum()) == 500
    assert out["n_dups"].max() > 1          # canonicalization really groups
    assert len(out) < 500                   # ...and shrinks the table
    # representative is the min id of its group: re-derive via pandas
    import pyarrow as pa

    from mvt_wrangler_ray.stages.web import canonicalize_url_batch
    full = canonicalize_url_batch(synth_dup_url_batch(
        pa.table({"doc_id": pa.array(ids)}))).to_pandas()
    want = (full.groupby("url_canon")
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index())
    got = out.sort_values("url_canon").reset_index(drop=True)
    want = want.sort_values("url_canon").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["url_canon", "doc_id", "n_dups"]].astype({"n_dups": np.int64}),
        want[["url_canon", "doc_id", "n_dups"]].astype({"n_dups": np.int64}))


# ---- Gopher-style repetition quality stats ----------------------------


def test_repetition_stats_known_values():
    import pyarrow as pa

    from mvt_wrangler_ray.stages.text import repetition_stats_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["A b a b A",   # 5 toks, 2 distinct, 'a b' x2
                 "x",           # single token: no bigram
                 "",            # empty
                 "   ",         # whitespace-only
                 "q q q q"]})   # 'q q' x3
    got = repetition_stats_batch(t).to_pandas().set_index("doc_id")
    assert got.loc[1].tolist() == [5, 2, 2]
    assert got.loc[2].tolist() == [1, 1, 0]
    assert got.loc[3].tolist() == [0, 0, 0]
    assert got.loc[4].tolist() == [0, 0, 0]
    assert got.loc[5].tolist() == [4, 1, 3]


def test_repetition_stats_matches_counter_oracle():
    # vectorized run-length plan == per-doc Counter reference on random
    # small-vocab texts (small vocab -> lots of repeats and tied modes)
    from collections import Counter

    import pyarrow as pa

    from mvt_wrangler_ray.stages.text import repetition_stats_batch

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(7)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(np.arange(300), pa.int64()),
                  "text": texts})
    got = repetition_stats_batch(t).to_pandas()
    for i, txt in enumerate(texts):
        toks = txt.lower().split()
        bg = Counter(zip(toks, toks[1:]))
        assert got.n_tokens[i] == len(toks)
        assert got.n_distinct[i] == len(set(toks))
        assert got.top_bigram_n[i] == (max(bg.values()) if bg else 0)


def test_pack_cli_end_to_end_and_resume(ray_session, tmp_path):
    import json as _json

    from mvt_wrangler_ray.__main__ import main

    out = str(tmp_path / "packed")
    rc = main(["pack", "/root/testdata/sf0.001/documents.parquet", out,
               "-L", "64", "-p", "4", "--num-cpus", "4"])
    assert rc == 0
    meta = _json.load(open(f"{out}/_metadata.json"))
    assert meta["metadata"]["run"]["partitions_written_this_run"] == 4
    # the written segments conserve the corpus token count
    import pandas as pd_

    segs = pd_.read_parquet(out)
    toks = pd_.read_parquet("/root/testdata/sf0.001/documents.parquet",
                            columns=["text"])["text"]
    total = int(toks.str.split().str.len().sum())
    assert int((segs["tok_end"] - segs["tok_start"]).sum()) == total
    assert set(segs.columns) >= {"seq_id", "doc_id", "tok_start", "tok_end"}
    # rerun: every partition skipped
    rc = main(["pack", "/root/testdata/sf0.001/documents.parquet", out,
               "-L", "64", "-p", "4", "--num-cpus", "4"])
    assert rc == 0
    meta = _json.load(open(f"{out}/_metadata.json"))
    assert meta["metadata"]["run"]["partitions_written_this_run"] == 0
    assert meta["metadata"]["run"]["partitions_skipped_resume"] == 4


# ---- deterministic seeded shuffle rank ---------------------------------


def test_seeded_shuffle_rank_properties(ray_session):
    from mvt_wrangler_ray.stages.shuffle import _splitmix, seeded_shuffle_rank

    ids = np.arange(0, 900, 3, dtype=np.int64)  # sparse ids
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = seeded_shuffle_rank(ds, seed=7, bucket_bits=4).to_pandas()
    # a permutation: ranks are exactly 0..n-1, ids all present
    assert sorted(out["shuffle_rank"]) == list(range(len(ids)))
    assert set(out["doc_id"]) == set(ids)
    # matches the single-node definition: argsort by (splitmix(id^seed), id)
    h = _splitmix(ids.astype(np.uint64) ^ np.uint64(7))
    order = np.lexsort((ids, h))
    want = pd.DataFrame({"doc_id": ids[order],
                         "shuffle_rank": np.arange(len(ids), dtype=np.int64)})
    got = out.sort_values("shuffle_rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # bucket width must not change the permutation
    out2 = seeded_shuffle_rank(ds, seed=7, bucket_bits=9).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))
    # a different seed gives a different permutation (new epoch order)
    out3 = seeded_shuffle_rank(ds, seed=8, bucket_bits=4).to_pandas()
    merged = out.merge(out3, on="doc_id")
    assert (merged["shuffle_rank_x"] != merged["shuffle_rank_y"]).any()


def test_canonicalize_url_differential_hypothesis():
    # differential check vs an independent urllib-based reference over
    # generated URLs covering every branch combination
    from urllib.parse import urlsplit

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mvt_wrangler_ray.stages.web import canonicalize_url_batch

    label = st.text(alphabet="abcdefgXYZ09-", min_size=1, max_size=6).filter(
        lambda s: not s.startswith("-") and not s.endswith("-"))
    urls = st.builds(
        lambda scheme, labels, port, path, params, frag:
            scheme + "://" + ".".join(labels) + port + path + params + frag,
        st.sampled_from(["http", "https", "HTTP", "HTTPS", "hTTps"]),
        st.lists(label, min_size=1, max_size=4),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.sampled_from(["", "/", "/a", "/a/b", "/a/", "/a//"]),
        st.sampled_from(["", "?utm_x=1", "?a=1", "?a=1&utm_y=2&b=3",
                         "?utm_a=1&utm_b=2"]),
        st.sampled_from(["", "#f", "#a?b"]))

    def reference(u):
        sp = urlsplit(u)
        scheme = sp.scheme.lower()
        host = sp.hostname or ""
        port = ""
        if sp.port is not None and not (
                (scheme, sp.port) in (("https", 443), ("http", 80))):
            port = f":{sp.port}"
        path = sp.path
        if path.endswith("/"):
            path = path[:-1]
        q = [kv for kv in sp.query.split("&")
             if kv and not kv.startswith("utm_")]
        return (scheme + "://" + host + port + path
                + ("?" + "&".join(q) if q else ""))

    @settings(max_examples=300, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=20))
    def run(batch):
        t = pa.table({"url": batch})
        got = canonicalize_url_batch(t)["url_canon"].to_pylist()
        want = [reference(u) for u in batch]
        assert got == want, (batch, got, want)

    run()


def test_round5_ops_empty_input_safe(ray_session):
    # empty partitions are routine at 100 TB: every round-5 operator
    # must produce an empty result, not a crash, on zero rows
    import pyarrow as pa

    from mvt_wrangler_ray.stages.pack import pack_sequences
    from mvt_wrangler_ray.stages.shuffle import seeded_shuffle_rank
    from mvt_wrangler_ray.stages.text import repetition_stats_batch
    from mvt_wrangler_ray.stages.web import (domain_cap_dedup,
                                             synth_dup_url_batch,
                                             synth_url_batch,
                                             url_exact_dedup)

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    empty_ids = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert pack_sequences(empty_docs, seq_len=8).take_all() == []
    assert seeded_shuffle_rank(empty_ids, seed=1).take_all() == []
    assert domain_cap_dedup(empty_ids.map_batches(
        synth_url_batch, batch_format="pyarrow")).take_all() == []
    assert url_exact_dedup(empty_ids.map_batches(
        synth_dup_url_batch, batch_format="pyarrow")).take_all() == []
    assert empty_docs.map_batches(
        repetition_stats_batch, batch_format="pyarrow").take_all() == []
