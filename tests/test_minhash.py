"""MinHash+LSH near-dup dedup: the distributed verify (pair-grouped groupby,
no driver-side pair loop or shingle rebuild) must agree with the exact
per-pair shingle Jaccard, and planted near-dups must be found."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _seeded_corpus(n=200, seed=13):
    """Docs of ~40 random words; every 10th doc is a near-copy of its
    predecessor with one word changed (known near-dup pairs)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:04d}" for i in range(400)]
    texts, expected_pairs = [], []
    for d in range(n):
        if d % 10 == 9 and d > 0:
            words = texts[d - 1].split()
            words[rng.integers(0, len(words))] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
            expected_pairs.append((d - 1, d))
        else:
            texts.append(
                " ".join(vocab[i] for i in rng.integers(0, len(vocab), size=40))
            )
    return (
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        expected_pairs,
    )


def _exact_jaccard(table: pa.Table, a: int, b: int) -> float:
    """Independent exact shingle Jaccard for one pair (test-side oracle)."""
    from lucene_plugin_ray.functions.analysis import tokenize_column
    from lucene_plugin_ray.pipelines.training import _shingle_hashes

    sub = table.filter(pc.is_in(table["doc_id"], value_set=pa.array([a, b])))
    parents, terms, _ = tokenize_column(pc.cast(sub["text"], pa.string()))
    docs_idx, hs = _shingle_hashes(parents, terms, sub.num_rows)
    ids = sub["doc_id"].to_numpy()
    sa = set(hs[ids[docs_idx] == a].tolist())
    sb = set(hs[ids[docs_idx] == b].tolist())
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_shingle_hashes_vectorized_semantics():
    """Sequence sensitivity, doc-boundary masking, short-doc fallback,
    per-doc distinctness."""
    from lucene_plugin_ray.functions.analysis import tokenize_column
    from lucene_plugin_ray.pipelines.training import _shingle_hashes

    col = pa.array(
        [
            "alpha beta gamma delta",   # 2 shingles (k=3)
            "gamma beta alpha",         # reversed — must differ from doc 0's
            "one two",                  # short doc → 1 whole-doc shingle
            "",                         # empty → none
            "alpha beta gamma alpha beta gamma",  # repeated shingle → distinct
        ]
    )
    parents, terms, _ = tokenize_column(col)
    docs, hs = _shingle_hashes(parents, terms, 5)
    per_doc = {d: hs[docs == d] for d in np.unique(docs)}
    assert len(per_doc[0]) == 2
    assert len(per_doc[1]) == 1
    assert per_doc[1][0] not in per_doc[0]  # order-sensitive
    assert len(per_doc[2]) == 1
    assert 3 not in per_doc
    # doc 4: windows = [abg, bga, gab, abg] → 3 DISTINCT
    assert len(per_doc[4]) == 3
    # no cross-boundary shingles: doc 0's trailing window must not mix doc 1
    docs2, hs2 = _shingle_hashes(parents[: parents.size], terms, 5)
    assert np.array_equal(docs2, docs) and np.array_equal(hs2, hs)


def test_minhash_pairs_match_exact_jaccard(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines import training

    table, expected = _seeded_corpus()
    d = tmp_path / "mh"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    out = training.dedup_minhash(str(d), jaccard_threshold=0.5)
    got_pairs = list(zip(out["doc_a"].to_pylist(), out["doc_b"].to_pylist()))
    # every reported jaccard equals the independently computed exact value
    for (a, b), j in zip(got_pairs, out["jaccard"].to_pylist()):
        assert abs(j - round(_exact_jaccard(table, a, b), 6)) < 1e-9
        assert j >= 0.5
    # the planted one-word-edit near-dups have jaccard ≈ (37-k)/(37+k) ≫ 0.5
    # and survive 16×4 LSH banding with overwhelming probability
    found = set(got_pairs)
    missing = [p for p in expected if p not in found]
    assert len(missing) <= max(1, len(expected) // 10), missing


def test_span_windows_unicode_safe(ray_session):
    """span_windows_batch gathers windows by BYTE offsets — multi-byte
    UTF-8 tokens must round-trip exactly (token boundaries are always valid
    split points)."""
    import pyarrow as pa

    from lucene_plugin_ray.functions.analysis import analyze
    from lucene_plugin_ray.pipelines.training import span_windows_batch

    texts = [
        "naïve café résumé über straße garçon fjörd œuvre piñata smörgås",
        "日本語 テスト один два три четыре пять шесть семь восемь девять десять",
        "mixed ascii und häßlich ümlauts every ωord ÿes ñot done yet",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = span_windows_batch(batch, k=3)
    got_pairs = set(zip(got["ngram"].to_pylist(), got["doc_id"].to_pylist()))
    exp_pairs = set()
    for did, t in enumerate(texts):
        toks = analyze(t)
        for i in range(len(toks) - 2):
            exp_pairs.add((" ".join(toks[i : i + 3]), did))
    assert got_pairs == exp_pairs


def test_simhash_pairs_exact_vs_bruteforce(ray_session):
    """Banded simhash pair search is EXACT for hamming <= 3 (pigeonhole
    over 4 bands): equals brute force over all signature pairs."""
    from lucene_plugin_ray.pipelines.training import simhash, simhash_pairs

    SF = "/root/testdata/sf0.001"
    pairs = simhash_pairs(SF)
    sigs = simhash(SF)
    ids = sigs["doc_id"].to_pylist()
    vals = [int(s, 16) for s in sigs["simhash"].to_pylist()]
    exp = sorted(
        (ids[i], ids[j], (vals[i] ^ vals[j]).bit_count())
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if (vals[i] ^ vals[j]).bit_count() <= 3
    )
    got = sorted(
        zip(
            pairs["doc_a"].to_pylist(),
            pairs["doc_b"].to_pylist(),
            pairs["hamming"].to_pylist(),
        )
    )
    assert got == exp
    assert len(got) > 0  # the seeded corpus contains simhash near-dups


def test_span_windows_trailing_empty_doc(ray_session):
    """Regression (ADVICE r2, high): a batch whose LAST document has zero
    surviving tokens (empty / all-stopword / non-[a-z0-9] script) made
    doc_first_tok == total token count and indexed cum out of bounds."""
    import pyarrow as pa

    from lucene_plugin_ray.pipelines.training import span_windows_batch

    for tail in ["", "the and of to", "…—!!"]:
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(
                    ["alpha beta gamma delta epsilon zeta", tail], type=pa.string()
                ),
            }
        )
        got = span_windows_batch(batch, k=5)
        assert got["doc_id"].to_pylist() == [1, 1]
    # empty doc in the middle + at the end
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                ["one two three four five six", "", "the of"], type=pa.string()
            ),
        }
    )
    got = span_windows_batch(batch, k=5)
    assert sorted(got["ngram"].to_pylist()) == [
        "one two three four five",
        "two three four five six",
    ]


def test_dedup_ngram_spans_hash_equals_string(ray_session):
    """The hash-keyed two-phase span dedup (8-byte shuffle keys + exact
    in-candidate string verify) must equal the string-keyed exact oracle —
    including under a truncated 8-bit hash that FORCES collisions, which
    exercises the verify phase's collision filtering."""
    from lucene_plugin_ray.pipelines.training import dedup_ngram_spans

    SF = "/root/testdata/sf0.001"
    exact = dedup_ngram_spans(SF, strategy="string")
    assert exact.num_rows > 0  # the seeded corpus contains shared spans
    assert exact.equals(dedup_ngram_spans(SF, strategy="hash"))
    assert exact.equals(dedup_ngram_spans(SF, strategy="hash", _hash_mask=0xFF))


def test_simhash_pairs_truncation_logged(ray_session, tmp_path, monkeypatch, caplog):
    """VERDICT r2 #5: oversized simhash band buckets are truncated
    deterministically AND surfaced (logged drop count) — no silent caps;
    sentinel rows never leak into the output."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines import training

    # 6 identical docs → identical signatures → every band bucket holds 6
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array([text] * 6, type=pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    monkeypatch.setattr(training, "_SIMHASH_BUCKET_CAP", 3)
    with caplog.at_level(logging.WARNING, logger="lucene_plugin_ray.pipelines.training"):
        out = training.simhash_pairs(str(d))
    assert any("truncated" in r.message for r in caplog.records)
    assert (out["doc_a"].to_numpy() >= 0).all()
    # the surviving head of each bucket (docs 0,1,2) still pairs exactly
    got = set(zip(out["doc_a"].to_pylist(), out["doc_b"].to_pylist()))
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_dedup_clusters_transitive_chain(ray_session, tmp_path):
    """Connected components over the near-dup pair graph: a chain A~B~C~D
    collapses into ONE cluster keyed by the min doc_id even though A and D
    share almost nothing directly; isolated docs are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines.training import dedup_clusters

    # adjacent docs overlap heavily (jaccard >= 0.5); doc 4 breaks the chain
    base = ["alpha beta gamma delta epsilon zeta eta theta".split(),
            ["iota", "kappa"]]
    texts = []
    toks = list(base[0])
    for i in range(4):                 # docs 0..3: rolling one-word edits
        texts.append(" ".join(toks))
        toks = toks[1:] + [f"w{i}"]
    texts.append("completely different vocabulary here entirely")  # doc 4
    texts.append("another unrelated document talks about ships")   # doc 5
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = dedup_clusters(str(d), threshold=0.5)
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in out.to_pylist()
    }
    assert got == {0: (0, 4), 1: (0, 4), 2: (0, 4), 3: (0, 4)}


def test_span_dedup_empty_candidate_paths(ray_session, tmp_path):
    """A corpus with NO shared k-token window (or too-short docs with no
    windows at all) must return schema'd empty results — the zero-batch
    collect used to crash pa.concat_tables([]) on every hash-strategy /
    candidate-pair path (review finding)."""
    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines.training import (
        _NGRAM_SPAN_K,
        dedup_minhash,
        dedup_ngram_spans,
        doc_dup_stats,
        simhash_pairs,
    )

    k = _NGRAM_SPAN_K
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    " ".join(f"alphaword{i}" for i in range(k + 3)),
                    " ".join(f"betaword{i}" for i in range(k + 3)),
                ],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "nodup"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    for strat in ("hash", "string"):
        out = dedup_ngram_spans(str(d), strategy=strat)
        assert out.num_rows == 0, strat
        assert out.column_names == ["ngram", "n_docs", "first_doc_id"]
    stats = doc_dup_stats(str(d))  # broadcast default → hash phase-1
    assert stats["doc_id"].to_pylist() == [0, 1]
    assert stats["n_dup_windows"].to_pylist() == [0, 0]
    # the other candidate-pair collects survive a pairless corpus too
    assert dedup_minhash(str(d)).num_rows == 0
    assert simhash_pairs(str(d)).num_rows == 0
    # docs shorter than k: zero windows anywhere
    tiny = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array(["only three words"], pa.string()),
        }
    )
    d2 = tmp_path / "tiny"
    d2.mkdir()
    pq.write_table(tiny, d2 / "documents.parquet")
    for strat in ("hash", "string"):
        assert dedup_ngram_spans(str(d2), strategy=strat).num_rows == 0
    assert doc_dup_stats(str(d2)).num_rows == 0
