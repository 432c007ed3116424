"""URL / domain operators for crawl-corpus curation.

The standard web-corpus ingestion steps between a raw crawl and the
dedup chain (stages/dedup.py): normalize each document's URL to its
REGISTERED DOMAIN (lowercased host, port stripped, public-suffix-aware
last-2/last-3 labels), then (a) cap the number of documents kept per
domain (keep the lowest ids — deterministic, resumable) and (b) compute
per-domain mixing stats (doc counts, total chars) that feed
``stages/shuffle.mixture_resample`` / ``temperature_weights`` as the
group weights. Composes with ``stages/dedup.incremental_dedup`` for
ingestion: run the domain cap on the INCOMING batch before the
hash-level dedup so a hot domain can't flood a crawl increment.

No reference analog (the reference is a tile engine); this is the
builder's-brief training-data axis. The suffix table is a deliberately
small public-suffix-LITE set (the common two-level suffixes) — the real
PSL is a data file, not an algorithm change; swap ``_TWO_LEVEL_SUFFIX``
for the full list at deployment.

Scale shape (100 TB): URL parsing is pure vectorized Arrow regex inside
``map_batches``; only the narrow (id, domain[, n_chars]) columns enter
the one bucketed groupby (domain-hash buckets, so a hot domain lands in
ONE group — the cap head is a lexsort, not a sort of the whole bucket);
payloads never move. Stats use the two-phase partial-aggregate path
(combiner before the small groupby). Survivor payload recovery is a
``bucketed_key_semi_join`` against the narrow survivor ids.

Test-fixture note (FIXTURES.md §7): the driver tables carry no URL
column, so ``synth_url_batch`` derives one deterministically from
``doc_id`` in pure integer/string arithmetic reproducible in SQL —
mixed-case schemes, ``www.``/``blog.`` subdomains, explicit ports,
query strings, and both 1-level and 2-level public suffixes, so the
normalizer is exercised on every branch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# public-suffix-lite: common two-level suffixes under which the
# registered domain is the LAST THREE labels
_TWO_LEVEL_SUFFIX = ("co.uk", "ac.jp", "co.jp", "com.au", "gov.uk",
                     "org.uk", "ne.jp")
_SUFFIX_RE = r"\.(" + "|".join(s.replace(".", r"\.")
                               for s in _TWO_LEVEL_SUFFIX) + r")$"

_TLDS = np.array(["com", "org", "net", "co.uk", "ac.jp"])
_SUBS = np.array(["www.", "", "blog."])


def synth_url_batch(batch: pa.Table, id_col: str = "doc_id",
                    out: str = "url") -> pa.Table:
    """Deterministic per-id URL (the derived-slice fixture generator —
    see module docstring). Mirrored exactly by the SQL in
    ``__ray_entry__._sql_domain_cte``."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    scheme = np.where(ids % 7 == 0, "HTTPS",
                      np.where(ids % 7 == 3, "http", "https"))
    parts = [
        scheme, np.repeat("://", len(ids)),
        _SUBS[ids % 3],
        np.repeat("site", len(ids)), (ids % 23).astype(str),
        np.repeat(".", len(ids)), _TLDS[ids % 5],
        np.where(ids % 11 == 0, ":443", ""),
        np.repeat("/p/", len(ids)), ids.astype(str),
        np.where(ids % 13 == 0, "?utm_source=feed", ""),
    ]
    url = parts[0]
    for p in parts[1:]:
        url = np.char.add(url, p)
    return batch.append_column(out, pa.array(url.tolist(), pa.string()))


def synth_dup_url_batch(batch: pa.Table, id_col: str = "doc_id",
                        out: str = "url") -> pa.Table:
    """Second derived-slice URL generator (FIXTURES.md §7), built to
    COLLIDE after canonicalization: case/port/tracking-param/fragment
    variants of a small canonical space (5 sites × 13 pages × the
    scheme/port/ref classes), so `url_exact_dedup` genuinely groups.
    Mirrored exactly by the SQL in ``__ray_entry__._sql_dup_url_cte``."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    scheme = np.where(ids % 7 == 0, "HTTPS",
                      np.where(ids % 7 == 3, "http", "https"))
    site = (ids % 5).astype(str)
    host = np.where(ids % 2 == 0,
                    np.char.add(np.char.add("DUP-SITE", site), ".COM"),
                    np.char.add(np.char.add("dup-site", site), ".com"))
    port = np.where(ids % 11 == 0, ":443",
                    np.where(ids % 11 == 5, ":8080", ""))
    path = np.char.add("/page/", (ids % 13).astype(str))
    q = np.where(ids % 3 == 0, "?utm_source=feed&utm_campaign=x",
                 np.where(ids % 3 == 1, "?ref=keepme", ""))
    frag = np.where(ids % 17 == 0, "#frag", "")
    url = scheme
    for p in (np.repeat("://", n), host, port, path, q, frag):
        url = np.char.add(url, p)
    return batch.append_column(out, pa.array(url.tolist(), pa.string()))


_URL_RE = (r"^(?P<s>[A-Za-z][A-Za-z0-9+.-]*)://(?P<h>[^/:?#]+)"
           r"(?P<port>:[0-9]+)?(?P<rest>[/?#].*)?$")


def canonicalize_url_batch(batch: pa.Table, url_col: str = "url",
                           out: str = "url_canon") -> pa.Table:
    """URL canonicalization for exact crawl dedup, all vectorized Arrow
    kernels: lowercase scheme + host, drop default ports (``:443`` for
    https, ``:80`` for http; other ports preserved), strip the
    fragment, remove ``utm_*`` tracking params (other params kept in
    order), strip a trailing slash from non-root paths. The standard
    first dedup key of every crawl pipeline — far higher precision than
    raw-string equality, far cheaper than content hashing."""
    parts = pc.extract_regex(batch[url_col], pattern=_URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "s"))
    host = pc.utf8_lower(pc.struct_field(parts, "h"))
    port = pc.struct_field(parts, "port")
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    default = pc.or_(
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, ":443")),
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, ":80")))
    port = pc.if_else(pc.fill_null(default, False), "",
                      pc.fill_null(port, ""))
    path = pc.struct_field(
        pc.extract_regex(rest, pattern=r"^(?P<p>[^?#]*)"), "p")
    path = pc.replace_substring_regex(path, pattern=r"/$",
                                      replacement="")
    # strip the fragment BEFORE extracting the query: a '?' inside a
    # fragment ('#a?b') is not a query separator (RFC 3986 §3.4/3.5)
    nofrag = pc.replace_substring_regex(rest, pattern=r"#.*$",
                                        replacement="")
    qm = pc.extract_regex(nofrag, pattern=r"\?(?P<q>.*)$")
    query = pc.fill_null(pc.struct_field(qm, "q"), "")
    query = pc.replace_substring_regex(
        query, pattern=r"(^|&)utm_[^&]*", replacement="")
    query = pc.replace_substring_regex(query, pattern=r"^&",
                                       replacement="")
    query = pc.if_else(pc.equal(query, ""), "",
                       pc.binary_join_element_wise("?", query, ""))
    canon = pc.binary_join_element_wise(
        scheme, "://", host, port, pc.fill_null(path, ""), query, "")
    # non-URL rows (no scheme://host match) canonicalize to null
    canon = pc.if_else(pc.is_null(parts), pa.scalar(None, pa.string()),
                       canon)
    return batch.append_column(out, canon)


def url_exact_dedup(ds, id_col: str = "doc_id", url_col: str = "url",
                    num_buckets: int = 32):
    """Exact URL-level dedup: canonicalize, then one narrow two-phase
    grouped aggregate per canonical URL → (url_canon, doc_id = min id,
    n_dups). Only (id, url_canon) cross the exchange."""
    from .shuffle import two_phase_aggregate

    def norm(batch: pa.Table) -> pa.Table:
        t = canonicalize_url_batch(batch, url_col=url_col)
        return t.select([id_col, "url_canon"])

    narrow = ds.map_batches(norm, batch_format="pyarrow")
    return two_phase_aggregate(
        narrow, ["url_canon"],
        partial_aggs=[(id_col, "min"), ([], "count_all")],
        partial_names=["p_min", "p_n"],
        final_aggs=[("p_min", "min"), ("p_n", "sum")],
        final_names=[id_col, "n_dups"],
        num_buckets=num_buckets)


def registered_domain_batch(batch: pa.Table, url_col: str = "url",
                            out: str = "domain") -> pa.Table:
    """URL -> registered domain, vectorized Arrow regex: host between
    ``://`` and the first of ``/ : ? #`` (port stripped by the class),
    lowercased; last 3 labels when the host ends in a two-level public
    suffix, else last 2; hosts with a single label pass through."""
    urls = batch[url_col]
    host_s = pc.extract_regex(urls, pattern=r"^[A-Za-z]+://(?P<h>[^/:?#]+)")
    host = pc.utf8_lower(pc.struct_field(host_s, "h"))
    two = pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+)$")
    three = pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+\.[^.]+)$")
    is3 = pc.fill_null(
        pc.match_substring_regex(host, pattern=_SUFFIX_RE), False)
    dom = pc.if_else(is3, pc.struct_field(three, "d"),
                     pc.struct_field(two, "d"))
    dom = pc.coalesce(dom, host)  # single-label host: keep as-is
    return batch.append_column(out, dom)


def _head_per_domain(g: pa.Table, cap: int, id_col: str,
                     domain_col: str) -> pa.Table:
    """Vectorized keep-lowest-``cap`` ids per domain within one group:
    dictionary-encode + lexsort + run-length rank, no pandas."""
    ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         domain_col: pa.array([], pa.string())})
    codes = np.asarray(
        pc.dictionary_encode(g[domain_col].combine_chunks()).indices)
    order = np.lexsort((ids, codes))
    c = codes[order]
    starts = np.concatenate(([0], np.flatnonzero(c[1:] != c[:-1]) + 1))
    lens = np.diff(np.concatenate((starts, [len(c)])))
    rank = np.arange(len(c), dtype=np.int64) - np.repeat(starts, lens)
    keep = np.sort(order[rank < cap])
    return g.select([id_col, domain_col]).take(pa.array(keep))


def domain_cap_dedup(ds, cap: int = 3, id_col: str = "doc_id",
                     url_col: str = "url", num_buckets: int = 32):
    """Per-domain document cap: normalize ``url_col`` to the registered
    domain and keep the ``cap`` lowest-``id_col`` docs per domain.
    Returns the narrow (id, domain) survivor Dataset — semi-join it back
    against the payload table to recover full rows."""
    from .shuffle import add_bucket_column

    def norm(batch: pa.Table) -> pa.Table:
        t = registered_domain_batch(batch, url_col=url_col)
        t = t.select([id_col, "domain"])
        return add_bucket_column(t, ["domain"], num_buckets)

    narrow = ds.map_batches(norm, batch_format="pyarrow")
    out = narrow.groupby("bucket").map_groups(
        lambda g: _head_per_domain(g, cap, id_col, "domain"),
        batch_format="pyarrow")
    return out


def domain_stats(ds, url_col: str = "url", chars_col: str = "n_chars",
                 num_buckets: int = 32):
    """Per-domain mixing stats: doc count + total chars. Two-phase
    (per-block combiner, then a small grouped merge) — the output feeds
    ``temperature_weights`` as the mixture ``counts``."""
    from .shuffle import two_phase_aggregate

    def norm(batch: pa.Table) -> pa.Table:
        t = registered_domain_batch(batch, url_col=url_col)
        return t.select(["domain", chars_col])

    narrow = ds.map_batches(norm, batch_format="pyarrow")
    return two_phase_aggregate(
        narrow, ["domain"],
        partial_aggs=[(chars_col, "sum"), ([], "count_all")],
        partial_names=["pc_chars", "pc_n"],
        final_aggs=[("pc_n", "sum"), ("pc_chars", "sum")],
        final_names=["n_docs", "total_chars"],
        num_buckets=num_buckets)
