"""repetition_stats + chunk_text edge cases the sf tables never hit:
empty docs, single-word docs, degenerate repetition, non-ASCII fallback,
double spaces (empty-token drop), and oracle equivalence on a hostile
corpus (test_entry.py covers the sf0.001 happy path)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_plugin_ray.pipelines import training

HOSTILE = [
    (0, "a a a a a"),                      # one word repeated
    (1, ""),                               # empty
    (2, "x"),                              # single word, no bigrams
    (3, "a b a b a b"),                    # dominant bigram
    (4, "the  quick   brown fox"),         # runs of spaces → empty tokens
    (5, "naïve café naïve café naïve"),    # non-ASCII (chunk fallback path)
    (6, "unique words only here now"),     # no repetition at all
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in HOSTILE], pa.int64()),
                "text": pa.array([t for _, t in HOSTILE], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def _oracle(sql_key: str, sf_dir: str) -> pd.DataFrame:
    import __ray_entry__ as E

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.sql(E.oracle_sql()[sql_key]).df()


def test_repetition_stats_hostile(ray_session, hostile_dir):
    got = training.repetition_stats(hostile_dir).to_pandas()
    exp = _oracle("repetition_stats", hostile_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9, rtol=0)
    r = got.set_index("doc_id")
    assert r.loc[0, "n_words"] == 5 and r.loc[0, "distinct_words"] == 1
    assert r.loc[0, "top_word_count"] == 5 and r.loc[0, "top_bigram_count"] == 4
    assert r.loc[1, "n_words"] == 0 and r.loc[1, "dup_word_fraction"] == 0.0
    assert r.loc[2, "top_bigram_count"] == 0
    assert r.loc[3, "top_bigram_count"] == 3  # "a b" ×3 beats "b a" ×2
    assert r.loc[4, "n_words"] == 4  # double spaces drop empty tokens
    assert r.loc[6, "dup_word_fraction"] == 0.0


def test_chunk_text_hostile_vs_oracle(ray_session, hostile_dir):
    # small window/stride so the hostile docs produce multiple chunks;
    # oracle inlined (the entry SQL hard-codes the default 160/120)
    got = training.chunk_text(hostile_dir, window=4, stride=3).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{hostile_dir}/documents.parquet')"
    )
    exp = con.sql(
        """
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       substr(text, CAST(chunk_idx * 3 + 1 AS BIGINT), 4) AS chunk_text
FROM (SELECT doc_id, text, unnest(range((length(text) + 2) // 3)) AS chunk_idx
      FROM documents)
ORDER BY doc_id, chunk_idx
"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # empty doc yields no chunks; non-ASCII doc sliced at codepoints
    assert (got["doc_id"] == 1).sum() == 0
    naive = got[got["doc_id"] == 5].iloc[0]["chunk_text"]
    assert naive == "naïv"  # 4 CODEPOINTS, not 4 bytes


def test_chunk_text_default_params_match_entry_oracle(ray_session, hostile_dir):
    got = training.chunk_text(hostile_dir).to_pandas()
    exp = _oracle("chunk_text", hostile_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_chunk_text_rejects_bad_params(hostile_dir):
    with pytest.raises(ValueError):
        training.chunk_text(hostile_dir, window=0)
    with pytest.raises(ValueError):
        training.chunk_text(hostile_dir, stride=-1)


def test_chunk_text_overflow_halving_equivalent(ray_session, hostile_dir):
    """The int32-offset overflow guard (batch halving) must not change
    results: force it with a tiny bytes cap and equate with the normal path."""
    normal = training.chunk_text(hostile_dir, window=4, stride=3).to_pandas()
    halved = training.chunk_text(
        hostile_dir, window=4, stride=3, _bytes_cap=8
    ).to_pandas()
    pd.testing.assert_frame_equal(normal, halved)


def test_span_windows_overflow_halving_equivalent(monkeypatch):
    """span_windows_batch halves oversized batches; distinct (ngram, doc)
    output must be identical (docs never split across halves)."""
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                    "one two three four five six seven eight nine ten eleven",
                    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                    "red orange yellow green blue indigo violet ultraviolet xray gamma",
                    "",  # zero-token doc inside the batch
                    "solo words here not enough for a window maybe yes indeed",
                ],
                pa.string(),
            ),
        }
    )
    normal = training.span_windows_batch(batch).to_pandas()
    monkeypatch.setattr(training, "_STRING_GATHER_BYTES_CAP", 4)
    halved = training.span_windows_batch(batch).to_pandas()
    key = ["ngram", "doc_id"]
    pd.testing.assert_frame_equal(
        normal.sort_values(key).reset_index(drop=True),
        halved.sort_values(key).reset_index(drop=True),
    )


def test_ngram_counts_hostile_vs_oracle(ray_session, hostile_dir):
    got = training.ngram_counts(hostile_dir).to_pandas()
    exp = _oracle("ngram_counts", hostile_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("ngram")
    assert r.loc["a a", "n_occ"] == 4 and r.loc["a a", "n_docs"] == 1
    assert r.loc["a b", "n_occ"] == 3 and r.loc["b a", "n_occ"] == 2
    # double spaces drop empty tokens → "the quick" is adjacent
    assert r.loc["the quick", "n_occ"] == 1
    # empty / single-word docs contribute no bigrams
    assert not any(r.index.str.startswith("x "))


def test_ngram_counts_salt_invariance(ray_session, hostile_dir):
    """Salt bucket count must not change results (it only spreads reducers)."""
    a = training.ngram_counts(hostile_dir, salt_buckets=1).to_pandas()
    b = training.ngram_counts(hostile_dir, salt_buckets=64).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_ngram_counts_hypothesis_vs_python(ray_session, tmp_path):
    """Randomized corpora (small alphabet to force shared bigrams across
    docs) equated against an independent pure-python counter."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "ab", "ba", ""])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    case = [0]

    @settings(max_examples=15, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def run(texts):
        case[0] += 1
        d = tmp_path / f"hyp{case[0]}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            d / "documents.parquet",
        )
        got = training.ngram_counts(str(d))
        occ, docs = Counter(), Counter()
        for i, t in enumerate(texts):
            words = [w for w in t.split(" ") if w != ""]
            bgs = [f"{a} {b}" for a, b in zip(words, words[1:])]
            occ.update(bgs)
            docs.update(set(bgs))
        exp = sorted(occ)
        assert got["ngram"].to_pylist() == exp
        assert got["n_occ"].to_pylist() == [occ[g] for g in exp]
        assert got["n_docs"].to_pylist() == [docs[g] for g in exp]

    run()
