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
    import os

    for t in ("documents", "events"):
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
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


CHARLM_DOCS = [
    (0, "abab"),                  # 3 bigrams: ab, ba, ab
    (1, ""),                      # no bigrams
    (2, "x"),                     # 1 char → no bigrams
    (3, "ünïcödé ünïcödé"),       # non-ASCII → codepoint fallback path
    (4, "abababab"),              # same distribution as doc 0
]


@pytest.fixture(scope="module")
def charlm_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("charlm")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in CHARLM_DOCS], pa.int64()),
                "text": pa.array([t for _, t in CHARLM_DOCS], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_charlm_logprob_matches_oracle_incl_non_ascii(ray_session, charlm_dir):
    got = training.charlm_logprob(charlm_dir).to_pandas()
    exp = _oracle("charlm_logprob", charlm_dir)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("doc_id")
    assert r.loc[0, "n_bigrams"] == 3
    assert r.loc[1, "n_bigrams"] == 0 and r.loc[1, "logprob_q"] == 0
    assert r.loc[2, "n_bigrams"] == 0 and r.loc[2, "logprob_q"] == 0
    assert r.loc[3, "n_bigrams"] == 14  # 15 CODEPOINTS (23 bytes)
    # log-probs are never positive; repetitive docs score proportionally
    assert (got["logprob_q"] <= 0).all()


def test_charlm_logprob_python_reference(ray_session, charlm_dir):
    """Independent pure-python oracle (no SQL): fit on codepoint bigrams,
    centibit quantization, integer sums."""
    import math
    from collections import Counter

    cnt = Counter()
    for _, t in CHARLM_DOCS:
        for a, b in zip(t, t[1:]):
            cnt[(a, b)] += 1
    pre = Counter()
    for (a, _), c in cnt.items():
        pre[a] += c
    q = {k: round(100 * math.log2(c / pre[k[0]])) for k, c in cnt.items()}
    got = training.charlm_logprob(charlm_dir).to_pandas().set_index("doc_id")
    for i, t in CHARLM_DOCS:
        expected = sum(q[(a, b)] for a, b in zip(t, t[1:]))
        assert got.loc[i, "logprob_q"] == expected, i


def test_char_bigram_ids_ascii_fast_path_equals_codepoint_fallback():
    """Property: the ASCII buffer fast path and the UTF-32 fallback compute
    the SAME bigram ids — forcing the fallback by appending a non-ASCII row
    must not change the ids of the ASCII rows (no Ray needed)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_plugin_ray.pipelines.training import (
        _CHARLM_BASE,
        _char_bigram_ids,
    )

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(ascii_text, min_size=1, max_size=8))
    def run(rows):
        fast_ids, fast_counts = _char_bigram_ids(pa.array(rows, pa.string()))
        # appending a non-ASCII row forces the per-row codepoint fallback
        slow_ids, slow_counts = _char_bigram_ids(
            pa.array(rows + ["ü"], pa.string())
        )
        assert list(fast_counts) == list(slow_counts[:-1])
        assert slow_counts[-1] == 0  # single-codepoint row → no bigrams
        assert fast_ids.tolist() == slow_ids.tolist()
        # python reference
        expect = [
            ord(a) * _CHARLM_BASE + ord(b)
            for r in rows
            for a, b in zip(r, r[1:])
        ]
        assert fast_ids.tolist() == expect

    run()


def test_deterministic_shuffle_seed_semantics(ray_session):
    """Same seed → byte-identical order; different seed → a different
    permutation; n_shards actually changes the shard domain."""
    SF = "/root/testdata/sf0.001"
    a1 = training.deterministic_shuffle(SF, seed=0)
    a2 = training.deterministic_shuffle(SF, seed=0)
    assert a1.equals(a2)
    b = training.deterministic_shuffle(SF, seed=1)
    assert not a1.equals(b)  # fresh epoch permutation
    assert set(a1["doc_id"].to_pylist()) == set(b["doc_id"].to_pylist())
    assert a1["shard"].to_pandas().max() < 256
    small = training.deterministic_shuffle(SF, n_shards=16)
    assert small["shard"].to_pandas().max() < 16
    # seed participates in the KEY, not just the shard: per-doc keys differ
    k0 = dict(zip(a1["doc_id"].to_pylist(), a1["shuffle_key"].to_pylist()))
    k1 = dict(zip(b["doc_id"].to_pylist(), b["shuffle_key"].to_pylist()))
    assert all(k0[d] != k1[d] for d in list(k0)[:20])
    with pytest.raises(ValueError):
        training.deterministic_shuffle(SF, n_shards=100)


def test_minhash_clusters_consistent_with_pairs(ray_session):
    """Cluster labeling must equal a union-find oracle over the SAME verified
    pair list: same membership, cluster_id = min member, sizes exact."""
    SF = "/root/testdata/sf0.001"
    pairs = training.dedup_minhash(SF)
    clusters = training.minhash_clusters(SF).to_pandas().set_index("doc_id")
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import defaultdict

    comps = defaultdict(set)
    for x in list(parent):
        comps[find(x)].add(x)
    assert set(clusters.index) == set(parent)
    for root, members in comps.items():
        for m in members:
            assert clusters.loc[m, "cluster_id"] == min(members)
            assert clusters.loc[m, "cluster_size"] == len(members)


@pytest.fixture(scope="module")
def tpch_dir(tmp_path_factory):
    """Tiny hand-built lineitem/supplier/nation: a revenue TIE between
    suppliers 1 and 2, one row past the Q1 shipdate cutoff."""
    d = tmp_path_factory.mktemp("r3tpch")
    ship_ok = dt.datetime(1997, 1, 1)
    ship_late = dt.datetime(1999, 1, 1)  # excluded from pricing_summary
    rows = [
        # (suppkey, qty, extprice, disc, tax, flag, status, shipdate, okey)
        (1, 10.0, 100.00, 0.10, 0.05, "A", "F", ship_ok, 1),
        (2, 20.0, 90.00, 0.00, 0.00, "A", "F", ship_ok, 1),  # 9000*100 = tie
        (1, 1.0, 500.00, 0.05, 0.08, "R", "O", ship_late, 2),
        (3, 5.0, 90.00, 0.00, 0.01, "N", "O", ship_ok, 3),
    ]
    # revenues: supplier 1 = 900000 + 4750000 (late row), suppliers 2 and 3
    # TIE at 9000*100 = 900000 → suppkey asc must break the tie
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[8] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
                "l_discount": pa.array([r[3] for r in rows], pa.float64()),
                "l_tax": pa.array([r[4] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[5] for r in rows], pa.string()),
                "l_linestatus": pa.array([r[6] for r in rows], pa.string()),
                "l_shipdate": pa.array([r[7] for r in rows], pa.timestamp("us")),
            }
        ),
        d / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["s-one", "s-two", "s-three"], pa.string()),
                "s_nationkey": pa.array([0, 1, 0], pa.int32()),
            }
        ),
        d / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
            }
        ),
        d / "nation.parquet",
    )
    # order 4 has NO lineitems — the LEFT-join branch of order_line_rollup
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_orderstatus": pa.array(["F", "O", "F", "P"], pa.string()),
            }
        ),
        d / "orders.parquet",
    )
    return str(d)


def test_pricing_summary_cutoff_and_exact_units(ray_session, tpch_dir):
    from lucene_plugin_ray.pipelines import relational

    got = relational.pricing_summary(tpch_dir).to_pandas()
    # the 1999 row is excluded → only (A,F) and (N,O) groups remain
    assert set(zip(got["l_returnflag"], got["l_linestatus"])) == {
        ("A", "F"), ("N", "O"),
    }
    af = got.set_index(["l_returnflag", "l_linestatus"]).loc[("A", "F")]
    assert af["n_rows"] == 2
    assert af["sum_qty_x100"] == 3000
    assert af["sum_base_cents"] == 10000 + 9000
    assert af["sum_disc_units"] == 10000 * 90 + 9000 * 100
    assert af["sum_charge_units"] == 10000 * 90 * 105 + 9000 * 100 * 100


def test_top_suppliers_tie_breaks_on_suppkey(ray_session, tpch_dir):
    from lucene_plugin_ray.pipelines import relational

    got = relational.top_suppliers(tpch_dir, k=2).to_pandas()
    # supplier 1 leads on the late row's revenue; suppliers 2 and 3 tie at
    # 900000 — the k=2 boundary must pick the LOWER suppkey (2, not 3)
    assert list(got["s_suppkey"]) == [1, 2]
    assert got.iloc[0]["revenue_units"] == 900000 + 50000 * 95
    assert got.iloc[1]["revenue_units"] == 900000
    assert list(got["n_name"]) == ["ALPHA", "BETA"]
    top3 = relational.top_suppliers(tpch_dir, k=3).to_pandas()
    assert list(top3["s_suppkey"]) == [1, 2, 3]
    with pytest.raises(ValueError):
        relational.top_suppliers(tpch_dir, k=0)


def test_order_line_rollup_lineless_orders(ray_session, tpch_dir):
    """The LEFT-join branch the TPC-H driver data never exercises (every
    driver order has lines): an order with NO lineitems counts in n_orders
    with zero lines/revenue — this also pins Ray's all-null-group Sum
    finalizing to null (the alpha-API behavior the op's fill_null relies
    on); a Ray upgrade that changed it to 0 would fail here."""
    from lucene_plugin_ray.pipelines import relational

    got = relational.order_line_rollup(tpch_dir).to_pandas()
    r = got.set_index("o_orderstatus")
    assert r.loc["F", "n_orders"] == 2
    assert r.loc["F", "n_orders_with_lines"] == 2
    assert r.loc["F", "n_lines"] == 3
    assert r.loc["F", "revenue_units"] == 900000 + 900000 + 900000
    assert r.loc["O", "n_orders"] == 1 and r.loc["O", "n_lines"] == 1
    assert r.loc["O", "revenue_units"] == 50000 * 95
    # the lineless order: counted, zero lines, zero revenue
    assert r.loc["P", "n_orders"] == 1
    assert r.loc["P", "n_orders_with_lines"] == 0
    assert r.loc["P", "n_lines"] == 0 and r.loc["P", "revenue_units"] == 0
    # oracle agreement on the same fixture
    import duckdb

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tpch_dir}/{t}.parquet')"
        )
    exp = con.sql(E.oracle_sql()["order_line_rollup"]).df()
    pd.testing.assert_frame_equal(
        got.sort_values("o_orderstatus").reset_index(drop=True),
        exp.sort_values("o_orderstatus").reset_index(drop=True),
        check_dtype=False,
    )


def test_distinct_users_null_user_semantics(ray_session, tmp_path):
    """count(DISTINCT user_id) parity: null-user events count in n_events
    but contribute no user."""
    from lucene_plugin_ray.pipelines import relational

    d = tmp_path / "nullusers"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
                "user_id": pa.array([1, None, 1, None], pa.int64()),
            }
        ),
        d / "events.parquet",
    )
    got = relational.distinct_users_by_type(str(d)).to_pandas()
    r = got.set_index("event_type")
    assert r.loc["a", "n_events"] == 3 and r.loc["a", "n_users"] == 1
    assert r.loc["b", "n_events"] == 1 and r.loc["b", "n_users"] == 0


def test_distinct_users_hll_error_bound(ray_session):
    """HLL estimate per type stays within 5 % of the exact distinct count
    (4096 registers → ~1.6 % std error; 5 % ≈ 3σ), and the sketch merge is
    deterministic (fixed hash spec)."""
    SF = "/root/testdata/sf0.01"
    from lucene_plugin_ray.pipelines import relational

    exact = (
        relational.distinct_users_by_type(SF)
        .to_pandas()
        .set_index("event_type")["n_users"]
    )
    est1 = relational.distinct_users_hll(SF).to_pandas().set_index("event_type")
    est2 = relational.distinct_users_hll(SF).to_pandas().set_index("event_type")
    pd.testing.assert_frame_equal(est1, est2)  # deterministic
    assert set(est1.index) == set(exact.index)
    for t_ in exact.index:
        rel = abs(est1.loc[t_, "n_users_est"] - exact[t_]) / max(exact[t_], 1)
        assert rel <= 0.05, (t_, rel)


def test_distinct_users_hll_high_cardinality_branch(ray_session, tmp_path):
    """Above 2.5·m (= 10240) the HYPERLOGLOG estimator (alpha + rank
    harmonic mean) takes over from linear counting — pin its error bound
    at 30k distinct users so a rank/alpha regression cannot hide."""
    import numpy as np

    from lucene_plugin_ray.pipelines import relational

    d = tmp_path / "hll_big"
    d.mkdir()
    n = 30_000
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["click"] * n, pa.string()),
                "user_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            }
        ),
        d / "events.parquet",
    )
    est = relational.distinct_users_hll(str(d)).to_pandas()
    assert list(est["event_type"]) == ["click"]
    rel = abs(int(est["n_users_est"][0]) - n) / n
    assert rel <= 0.05, rel


def test_user_funnel_null_conversion_and_null_users(ray_session, tmp_path):
    """The NOT-EXISTS subset and edge semantics: purchase BEFORE the first
    signup does not count as conversion; users with no signup are absent;
    null-user rows are dropped (SQL join semantics) — all vs the oracle."""
    import duckdb

    import __ray_entry__ as E
    from lucene_plugin_ray.pipelines import relational

    d = tmp_path / "funnel"
    d.mkdir()
    t0 = dt.datetime(2026, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        (1, "purchase", ts(5)),   # BEFORE user 1's signup → not a conversion
        (1, "signup", ts(10)),
        (2, "signup", ts(0)),
        (2, "purchase", ts(100)),  # converts after 100 s
        (3, "purchase", ts(50)),   # never signed up → absent
        (None, "signup", ts(1)),   # null user → dropped
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        d / "events.parquet",
    )
    got = relational.user_funnel(str(d)).to_pandas()
    r = got.set_index("user_id")
    assert set(r.index) == {1, 2}
    assert pd.isna(r.loc[1, "conversion_us"])  # the NOT-EXISTS subset
    assert r.loc[1, "n_purchases"] == 1  # counted, just not a conversion
    assert r.loc[2, "conversion_us"] == 100_000_000
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    exp = con.sql(E.oracle_sql()["user_funnel"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_top_suppliers_dangling_suppkey_raises(ray_session, tmp_path, tpch_dir):
    """A lineitem suppkey missing from supplier must raise loudly, not
    resolve to a neighboring supplier's name."""
    import shutil

    from lucene_plugin_ray.pipelines import relational

    d = tmp_path / "dangling"
    d.mkdir()
    for f in ("supplier.parquet", "nation.parquet"):
        shutil.copy(f"{tpch_dir}/{f}", d / f)
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array([99], pa.int64()),
                "l_quantity": pa.array([1.0], pa.float64()),
                "l_extendedprice": pa.array([10.0], pa.float64()),
                "l_discount": pa.array([0.0], pa.float64()),
                "l_tax": pa.array([0.0], pa.float64()),
                "l_returnflag": pa.array(["A"], pa.string()),
                "l_linestatus": pa.array(["F"], pa.string()),
                "l_shipdate": pa.array(
                    [dt.datetime(1997, 1, 1)], pa.timestamp("us")
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    with pytest.raises(ValueError, match="suppkey absent"):
        relational.top_suppliers(str(d), k=1)


# ---------------------------------------------------------------------------
# value_quantiles_sketch — integer-exact DDSketch-style quantile sketch
# ---------------------------------------------------------------------------


def _vqs_corpus(tmp_path, values, types=None):
    n = len(values)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(types or ["t"] * n, pa.string()),
                "value": pa.array(values, pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    return str(tmp_path)


def test_vqs_error_bound_vs_exact(ray_session, tmp_path):
    """Every estimate is a bucket lower bound ≤ the true order statistic
    < estimate · 33/32 (keys ≥ 32), or exactly equal (keys < 32)."""
    import numpy as np

    from lucene_plugin_ray.pipelines import training

    rng = np.random.default_rng(11)
    vals = np.round(rng.lognormal(3.0, 1.5, size=5000), 2)
    d = _vqs_corpus(tmp_path, vals.tolist())
    out = training.value_quantiles_sketch(d).to_pylist()[0]
    cents = np.sort(np.round(vals * 100).astype(np.int64))
    n = cents.size
    for p in (50, 90, 99):
        # the repo-wide order statistic: smallest value with cum·100 ≥ n·p
        true = int(cents[int(np.ceil(n * p / 100.0)) - 1])
        est = out[f"p{p}_cents"]
        assert est <= true < max(est + 1, est * 33 // 32 + 1), (p, est, true)


def test_vqs_exact_below_32_and_batching_independence(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines import training

    # all cents < 32 → the sketch IS exact
    vals = [0.01, 0.05, 0.05, 0.10, 0.31, 0.31, 0.31]
    d = _vqs_corpus(tmp_path, vals)
    out = training.value_quantiles_sketch(d).to_pylist()[0]
    assert out["p50_cents"] == 10  # 4th of 7 sorted cents [1,5,5,10,31,31,31]
    assert out["p99_cents"] == 31
    assert out["n_events"] == 7


def test_vqs_multi_type_and_validation(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines import training

    d = _vqs_corpus(
        tmp_path, [1.0, 2.0, 300.0, 4.0], types=["a", "a", "b", "b"]
    )
    out = training.value_quantiles_sketch(d)
    assert out["event_type"].to_pylist() == ["a", "b"]
    with pytest.raises(ValueError):
        training.value_quantiles_sketch(d, percents=(0,))
    with pytest.raises(ValueError):
        training.value_quantiles_sketch(d, percents=())


def test_vqs_negative_values_raise(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines import training

    d = _vqs_corpus(tmp_path, [1.0, -2.0])
    with pytest.raises(Exception, match="non-negative"):
        training.value_quantiles_sketch(d)


def test_vqs_key_roundtrip_pins_bucket_scheme():
    """The bucketing is part of the oracle contract: pin the key and
    lower-bound maps on hand values."""
    import numpy as np

    from lucene_plugin_ray.pipelines.training import _vqs_lower_bound

    def key_of(cents: int) -> int:
        if cents < 32:
            return cents
        e = int(cents).bit_length()
        return 32 * (e - 6) + (cents >> (e - 6))

    for cents in [0, 1, 31, 32, 33, 63, 64, 65, 127, 128, 1000, 48999, 2**40]:
        k = key_of(cents)
        lb = _vqs_lower_bound(k)
        assert lb <= cents, (cents, k, lb)
        if cents < 32:
            assert lb == cents
        else:
            # next bucket's lower bound bounds the relative error by 1/32
            assert cents < _vqs_lower_bound(k + 1) <= lb + max(lb // 32, 1)


def test_events_latest_null_user_rows(ray_session, tmp_path):
    """Round-4 review finding (confirmed): null user_id rows must form
    their OWN (user, type) groups — the combiner/fold key is null-FILLED,
    not null-propagating (a null key made the last-per-key mask silently
    merge the null rows across types and swallow the adjacent valid
    key's row)."""
    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines import training

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([10, 20, 30, 40], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([None, None, 1, 1], pa.int64()),
                "event_type": pa.array(
                    ["purchase", "signup", "signup", "signup"], pa.string()
                ),
                "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        ),
        f"{sf}/events.parquet",
    )
    t = training.events_latest(sf)
    rows = {
        (r["user_id"], r["event_type"]): r["last_event_id"]
        for r in t.to_pylist()
    }
    # three groups: (null, purchase), (null, signup), (1, signup=latest id 4)
    assert rows == {
        (None, "purchase"): 1,
        (None, "signup"): 2,
        (1, "signup"): 4,
    }
