"""Edge cases for the round-3b ops (paragraph_dedup, length_quantiles,
events_rolling) beyond the driver tables: cross/intra-document duplicate
blocks, empty and all-duplicate documents, identical-timestamp window peers,
exact 1-hour boundary inclusion, zero-token quantile docs."""

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_plugin_ray.pipelines import training

BLOCK = " ".join(f"w{i}" for i in range(16))          # one full shared block
OTHER = " ".join(f"x{i}" for i in range(16))          # a distinct full block
TAIL = "short tail block"                              # partial (3-word) block

DOCS = [
    (0, BLOCK + " " + OTHER),            # owns both blocks (first occurrence)
    (1, BLOCK + " " + TAIL),             # block 0 duplicates doc 0 → dropped
    (2, OTHER + " " + OTHER),            # intra-doc dup: second copy dropped
    (3, ""),                             # empty doc → 0 blocks
    (4, BLOCK),                          # all-dup doc → clean_text ''
    (5, TAIL),                           # partial block duplicating doc 1's
    (6, "  spaced   out  " + TAIL),      # run-of-spaces tokens dropped
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3ops")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
                "source": pa.array(
                    ["a", "a", "a", "b", "b", "b", "b"], pa.string()
                ),
            }
        ),
        d / "documents.parquet",
    )
    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes: float) -> dt.datetime:
        return base + dt.timedelta(minutes=minutes)

    # user 1: a tie pair at t=0, one inside the window, one exactly 60 min
    # before the anchor (inclusive), one outside; user 2: single event
    rows = [
        (100, ts(0), 1, "a", 1.00),
        (101, ts(0), 1, "a", 2.00),      # peer at identical ts
        (102, ts(30), 1, "a", 4.00),
        (103, ts(60), 1, "a", 8.00),     # anchor: window [t0, t60] inclusive
        (104, ts(121), 1, "a", 16.00),   # only itself (t=61..121 → just 104)
        (105, ts(5), 2, "b", 32.00),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def _oracle(sql_key: str, sf_dir: str) -> pd.DataFrame:
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(E.oracle_sql()[sql_key]).df()


def test_paragraph_dedup_edges(ray_session, corpus_dir):
    got = training.paragraph_dedup(corpus_dir).to_pandas()
    exp = _oracle("paragraph_dedup", corpus_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("doc_id")
    # doc 0 owns both blocks
    assert r.loc[0, "n_dup_blocks"] == 0
    assert r.loc[0, "clean_text"] == BLOCK + " " + OTHER
    # doc 1 loses the shared block, keeps its tail
    assert r.loc[1, "n_dup_blocks"] == 1
    assert r.loc[1, "clean_text"] == TAIL
    # intra-doc duplicate: doc 2's second OTHER copy... both 16-word copies
    # form blocks 0 and 1 with identical text, but block 0 already lost to
    # doc 0's OTHER — so BOTH drop
    assert r.loc[2, "n_dup_blocks"] == 2
    assert r.loc[2, "clean_text"] == ""
    # empty doc
    assert r.loc[3, "n_blocks"] == 0 and r.loc[3, "clean_text"] == ""
    # all-dup doc rewrites to empty
    assert r.loc[4, "n_dup_blocks"] == 1 and r.loc[4, "clean_text"] == ""
    # partial blocks dedup too (doc 5 text duplicates doc 1's tail block)
    assert r.loc[5, "n_dup_blocks"] == 1 and r.loc[5, "clean_text"] == ""
    # doc 6: leading words differ so its block ('spaced out short tail' +
    # remainder) is unique — run-of-space empties must not split blocks
    assert r.loc[6, "n_dup_blocks"] == 0
    assert r.loc[6, "clean_text"] == "spaced out " + TAIL


def test_paragraph_dedup_block_words_validation(ray_session, corpus_dir):
    with pytest.raises(ValueError):
        training.paragraph_dedup(corpus_dir, block_words=0)


def test_events_rolling_window_semantics(ray_session, corpus_dir):
    got = training.events_rolling(corpus_dir).to_pandas()
    exp = _oracle("events_rolling", corpus_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("event_id")
    # identical-ts peers BOTH see each other (RANGE, not ROWS)
    assert r.loc[100, "n_win"] == 2 and r.loc[100, "win_sum_cents"] == 300
    assert r.loc[101, "n_win"] == 2 and r.loc[101, "win_sum_cents"] == 300
    # anchor at +60 min includes the boundary events at t0 (inclusive)
    assert r.loc[103, "n_win"] == 4
    assert r.loc[103, "win_sum_cents"] == 1500
    # +121 min: everything else is > 1 h behind
    assert r.loc[104, "n_win"] == 1 and r.loc[104, "win_sum_cents"] == 1600
    # users never mix
    assert r.loc[105, "n_win"] == 1 and r.loc[105, "win_sum_cents"] == 3200


def test_length_quantiles_edges(ray_session, corpus_dir):
    got = training.length_quantiles(corpus_dir).to_pandas()
    exp = _oracle("length_quantiles", corpus_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("source")
    # source b contains the empty doc → zero-token rows still counted
    assert r.loc["b", "n_docs"] == 4
    assert r.loc["b", "p10"] == 0  # smallest length with cum ≥ 10 % is 0
    assert (got["sum_tokens"] >= 0).all()


def test_length_quantiles_validation(ray_session, corpus_dir):
    with pytest.raises(ValueError):
        training.length_quantiles(corpus_dir, percents=(0,))
    with pytest.raises(ValueError):
        training.length_quantiles(corpus_dir, percents=())
