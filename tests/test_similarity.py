"""Pluggable similarities (IndexSearcher.setSimilarity analogue):
classic TF-IDF / boolean / LMDirichlet vs a brute-force referee built on
OracleIndex's postings, the LMDirichlet clamp-at-0 matched-set contract,
path equivalences (pure-AND galloping == TAAT under every similarity),
explain parity, and the sharded ttf-injection guard."""

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.similarity import (
    BM25Similarity,
    LMDirichletSimilarity,
    resolve_similarity,
)
from lucene_plugin_ray.pipelines.fixtures import make_pages
from lucene_plugin_ray.pipelines.oracle import OracleIndex

N_DOCS = 300
SIMS = ["bm25", "classic", "boolean", "lmdirichlet", "lmjelinekmercer", "dfr_inl2"]
QUERIES = [
    "w00000",
    "w00001 w00005 w00020",
    "+w00000 +w00002",
    "firstword0 w00003",
]


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS, seed=7)


@pytest.fixture(scope="module")
def built(ray_session, corpus, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("simidx"))
    cfg = IndexConfig(index_root=root, num_partitions=3)
    build_index(corpus, cfg)
    engines = {s: SearchEngine(root, cfg=cfg, similarity=s) for s in SIMS}
    oracle = OracleIndex(corpus, cfg)
    return cfg, engines, oracle


def _brute(oracle: OracleIndex, sim: str, terms, musts=(), field="text"):
    """Per-doc reference scores straight off OracleIndex postings under the
    documented per-similarity contracts (functions/similarity.py)."""
    n = oracle.n_docs["default"]
    sum_dl = sum(oracle.doc_len[field].values())
    avgdl = sum_dl / n
    scores: dict[int, float] = {}
    matched: dict[int, set] = {}
    for t in set(terms) | set(musts):
        post = oracle.postings[field].get(t, {})
        df = len(post)
        ttf = sum(post.values())
        for d, tf in post.items():
            dl = oracle.doc_len[field][d]
            if sim == "bm25":
                w = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s = w * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
            elif sim == "classic":
                w = math.log((n + 1) / (df + 1)) + 1
                s = math.sqrt(tf) * w * w / math.sqrt(dl)
            elif sim == "boolean":
                s = 1.0
            elif sim == "lmdirichlet":
                mu = 2000.0
                v = math.log(1 + tf / (mu * ttf / sum_dl)) + math.log(
                    mu / (dl + mu)
                )
                s = max(v, 0.0)
            elif sim == "lmjelinekmercer":
                lam = 0.1
                s = math.log(
                    1 + (1 - lam) * tf / dl / (lam * ttf / sum_dl)
                )
            else:  # dfr_inl2
                tfn = tf * math.log2(1 + avgdl / dl)
                s = tfn / (1 + tfn) * math.log2((n + 1) / (df + 0.5))
            scores[d] = scores.get(d, 0.0) + s
            matched.setdefault(d, set()).add(t)
    out = {}
    for d, s in scores.items():
        if musts and not set(musts) <= matched[d]:
            continue
        out[oracle.url_of[d]] = s
    return out


@pytest.mark.parametrize("sim", SIMS)
@pytest.mark.parametrize("query", QUERIES)
def test_matches_brute_force(built, sim, query):
    cfg, engines, oracle = built
    terms = [t.lstrip("+") for t in query.split()]
    musts = [t[1:] for t in query.split() if t.startswith("+")]
    exp = _brute(oracle, sim, terms, musts)
    got = engines[sim].search(query, limit=10**9)
    got_map = dict(zip(got["url"].to_pylist(), got["score"].to_pylist()))
    assert set(got_map) == set(exp), f"{sim} {query}: match set differs"
    for u, s in got_map.items():
        assert abs(s - exp[u]) < 1e-9, f"{sim} {query} {u}: {s} vs {exp[u]}"


@pytest.mark.parametrize("sim", ["classic", "lmdirichlet", "lmjelinekmercer", "dfr_inl2"])
def test_pure_and_equals_taat(built, sim):
    # the galloping intersection is gated off for method='bmw' (falls back
    # to TAAT) — the two paths must agree under every similarity
    cfg, engines, oracle = built
    a = engines[sim].search("+w00000 +w00001", limit=10**9, method="taat")
    b = engines[sim].search("+w00000 +w00001", limit=10**9, method="bmw")
    assert a.equals(b)


def test_blockmax_methods_fall_back_exactly(built):
    # bmw/bmax store BM25 upper bounds: a non-BM25 engine must route those
    # method names through exact TAAT, bit-identical to method='taat'
    cfg, engines, oracle = built
    for m in ("bmw", "bmax"):
        a = engines["classic"].search("w00000 w00001", limit=50, method=m)
        b = engines["classic"].search("w00000 w00001", limit=50, method="taat")
        assert a.equals(b)


def test_phrase_under_classic(built):
    """Phrase pseudo-term: tf = exact-adjacency phrase frequency, w = sum
    of constituent classic idfs, squared once (the documented contract)."""
    cfg, engines, oracle = built
    q = '"w00000 w00001"'
    got = engines["classic"].search(q, limit=10**9)
    n = oracle.n_docs["default"]
    sum_dl = sum(oracle.doc_len["text"].values())
    # brute phrase freq from the oracle's positional streams
    exp = {}
    for d, toks in oracle.toks["text"].items():
        pos = {}
        for t, p in toks:
            pos.setdefault(t, set()).add(p)
        a, b = pos.get("w00000", set()), pos.get("w00001", set())
        pf = sum(1 for p in a if p + 1 in b)
        if pf:
            exp[oracle.url_of[d]] = pf
    w = sum(
        math.log((n + 1) / (len(oracle.postings["text"][t]) + 1)) + 1
        for t in ("w00000", "w00001")
    )
    got_map = dict(zip(got["url"].to_pylist(), got["score"].to_pylist()))
    assert set(got_map) == set(exp)
    for d, toks in oracle.toks["text"].items():
        u = oracle.url_of[d]
        if u in exp:
            dl = oracle.doc_len["text"][d]
            want = math.sqrt(exp[u]) * w * w / math.sqrt(dl)
            assert abs(got_map[u] - want) < 1e-9


def _tiny_corpus():
    """A corpus engineered so LMDirichlet clamps: 'common' is everywhere
    (high collection probability) and the docs are long enough that the
    length penalty dominates — every per-term score goes negative → 0."""
    texts = [
        "common " * 40 + "alpha",
        "common " * 60 + "beta",
        "common " * 50,
        "rare gamma " + "common " * 30,
    ]
    return pa.table(
        {
            "url": [f"https://t.example/{i}" for i in range(len(texts))],
            "warc_ts": pa.array(
                [1_600_000_000_000_000 + i for i in range(len(texts))],
                pa.int64(),
            ),
            "text": texts,
        }
    )


def test_lmdirichlet_clamp_keeps_matched_docs(ray_session, tmp_path):
    """A doc whose every term contribution clamps to 0 still MATCHES (score
    0.0 row — Lucene LMSimilarity parity), and count() agrees with the
    result-row count."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = _tiny_corpus()
    root = str(tmp_path / "lm")
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(corpus, cfg)
    eng = SearchEngine(root, cfg=cfg, similarity="lmdirichlet")
    res = eng.search("common", limit=10**9)
    assert res.num_rows == 4 == eng.count("common")
    scores = res["score"].to_pylist()
    # the tf≈dl docs sit just UNDER the collection-average rate → their
    # contributions go negative and clamp; the denser docs stay positive.
    # All four remain in the result set either way.
    assert sorted(s == 0.0 for s in scores) == [False, False, True, True], (
        scores
    )
    # sanity: the clamp is doing work — the unclamped values are negative
    sim = LMDirichletSimilarity()
    f = sim.scorer(4, 180, 4, (180 + 4) / 4)
    assert f(np.array([40]), np.array([41]))[0] == 0.0
    # a genuinely informative term still scores > 0
    res2 = eng.search("gamma", limit=10)
    assert res2.num_rows == 1 and res2["score"][0].as_py() > 0.0


def test_lmdirichlet_search_after_pages_with_zero_scores(
    ray_session, tmp_path
):
    # deep pagination under a clamping similarity: pages concatenate to the
    # full result (exercises the explicit-match path through search_after)
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = _tiny_corpus()
    root = str(tmp_path / "lmpage")
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(corpus, cfg)
    eng = SearchEngine(root, cfg=cfg, similarity="lmdirichlet")
    full = eng.search("common alpha", limit=10**9)
    p1 = eng.search("common alpha", limit=2)
    last = p1.num_rows - 1
    p2 = eng.search_after(
        "common alpha",
        p1["score"][last].as_py(),
        p1["url"][last].as_py(),
        limit=10,
    )
    got = pa.concat_tables([p1, p2])
    assert got.equals(full)


@pytest.mark.parametrize("sim", ["classic", "lmdirichlet", "boolean", "lmjelinekmercer", "dfr_inl2"])
def test_explain_sum_equals_search(built, sim):
    cfg, engines, oracle = built
    eng = engines[sim]
    res = eng.search("w00000 w00005", limit=5)
    assert res.num_rows
    url = res["url"][0].as_py()
    ex = eng.explain("w00000 w00005", url)
    assert ex["matched"] is True
    assert abs(ex["score"] - res["score"][0].as_py()) < 1e-12


def test_unknown_similarity_raises(tmp_path, ray_session):
    with pytest.raises(ValueError, match="unknown similarity"):
        resolve_similarity("tfidf", 1.2, 0.75)


def test_partial_injection_requires_ttf(built):
    """Sharded contract: an lmdirichlet engine given injected global_df
    without global_ttf must refuse loudly (silent all-zero scores
    otherwise)."""
    cfg, engines, oracle = built
    eng = engines["lmdirichlet"]
    stats = {
        "default": {
            "n_docs": oracle.n_docs["default"],
            "sum_dl": {"text": sum(oracle.doc_len["text"].values())},
        }
    }
    df = {("text", "w00000"): len(oracle.postings["text"]["w00000"])}
    with pytest.raises(ValueError, match="global_ttf"):
        eng.search_partial("w00000", global_stats=stats, global_df=df)
    # and with ttf injected it works and equals the local-gather path
    ttf = {
        ("text", "w00000"): sum(oracle.postings["text"]["w00000"].values())
    }
    got = eng.search_partial(
        "w00000", global_stats=stats, global_df=df, global_ttf=ttf
    )
    assert got.equals(eng.search("w00000", limit=cfg.result_limit))


def test_similarity_instance_passthrough(built):
    cfg, engines, oracle = built
    from lucene_plugin_ray.pipelines.query import SearchEngine

    eng = SearchEngine(
        cfg.index_root, cfg=cfg, similarity=BM25Similarity(k1=1.2, b=0.75)
    )
    assert eng.search("w00000", limit=20).equals(
        engines["bm25"].search("w00000", limit=20)
    )
