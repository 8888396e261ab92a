"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes one entry per implemented operator/pipeline from
SURVEY.md §2 plus the training-data operator family; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible one (identical column
names; floats rounded identically on both sides).  Non-SQL-expressible ops
(LSH/SimHash/IVF/lang-id heuristics) are exposed rows-only.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import STOP_WORDS, SQL_STOPWORD_LIST, analyze

# DuckDB list literal of the stop set (for list_contains in lambdas)
_SQL_STOP_LIST_LITERAL = "[" + ", ".join(f"'{w}'" for w in sorted(STOP_WORDS)) + "]"

# ---------------------------------------------------------------------------
# shared SQL fragments — textually mirror the analyzer spec
# (lucene_plugin_ray/functions/analysis.py) and the BM25 formula
# (lucene_plugin_ray/functions/bm25.py)
# ---------------------------------------------------------------------------

_TOKS = (
    "SELECT doc_id, unnest(string_split_regex(lower({col}), '[^a-z0-9]+')) AS term "
    "FROM documents"
)


def _toks_cte(col: str = "text") -> str:
    return (
        f"WITH raw AS ({_TOKS.format(col=col)}), "
        f"toks AS (SELECT doc_id, term FROM raw WHERE term <> '' "
        f"AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST})"
    )


def _bm25_sql(
    terms: list[str],
    col: str = "text",
    conjunctive: bool = False,
    min_match: int | None = None,
    round_to: int | None = 4,
) -> str:
    """Full-corpus BM25 (k1=1.2, b=0.75, ln(1+(N-df+.5)/(df+.5))) over the
    documents table for the analyzed query ``terms`` — all matching docs
    (no top-k boundary → no tie-ordering sensitivity), scores rounded to 4.
    ``min_match``: minimum distinct matching terms (the SQL mirror of
    BooleanQuery.setMinimumNumberShouldMatch on a pure-SHOULD term query).
    ``round_to=None`` emits the raw sum — for callers that post-multiply
    (function score) and must round ONLY the final value, matching the
    engine's round-after-weighting order."""
    values = ", ".join(f"('{t}')" for t in terms)
    if conjunctive:
        must = f"HAVING count(DISTINCT tf.term) = {len(set(terms))}"
    elif min_match is not None:
        must = f"HAVING count(DISTINCT tf.term) >= {min_match}"
    else:
        must = ''
    raw = """sum(
         ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl))
       )"""
    score_expr = raw if round_to is None else f"round({raw}, {round_to})"
    return f"""
{_toks_cte(col)},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
qterms AS (SELECT * FROM (VALUES {values}) q(term)),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE term IN (SELECT term FROM qterms) GROUP BY term)
SELECT tf.doc_id AS doc_id,
       {score_expr} AS score
FROM tf
JOIN df USING (term)
JOIN docs ON docs.doc_id = tf.doc_id
CROSS JOIN stats s
GROUP BY tf.doc_id
{must}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# index build over the documents table (cached per sf_dir per process)
# ---------------------------------------------------------------------------

_ENGINES: dict[str, Any] = {}


def _engine_for(sf_dir: str):
    eng = _ENGINES.get(sf_dir)
    if eng is not None:
        return eng
    import hashlib
    import shutil

    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.sources.pages import documents_as_pages

    root = os.path.join(
        "/tmp/lucene_plugin_ray_entry",
        hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(root, ignore_errors=True)
    cfg = IndexConfig(
        index_root=root, num_partitions=8, field_columns=("lang", "source")
    )
    build_index(documents_as_pages(sf_dir), cfg)
    eng = (SearchEngine(root, cfg=cfg), cfg)
    _ENGINES[sf_dir] = eng
    return eng


_MULTI_SERVICES: dict[str, Any] = {}
# non-default-similarity engines over the _engine_for root, keyed
# (sf_dir, similarity) — IndexSearcher.setSimilarity is a searcher
# property, so these share the built index with the BM25 engine
_SIM_ENGINES: dict[tuple[str, str], Any] = {}


def _multi_service_for(sf_dir: str):
    """MultiReader federation for the multireader_search entry: the
    documents corpus split by doc_id parity into two independently built
    roots (different partition counts on purpose), federated by
    MultiIndexSearcherService — scores must equal the ONE-index BM25 the
    search_term oracle computes over the full table."""
    svc = _MULTI_SERVICES.get(sf_dir)
    if svc is not None:
        return svc
    import hashlib
    import shutil

    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService
    from lucene_plugin_ray.sources.pages import documents_as_pages

    base = os.path.join(
        "/tmp/lucene_plugin_ray_entry_multi",
        hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(base, ignore_errors=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    roots = []
    for k in range(2):
        part_ids = _pc.equal(_pc.bit_wise_and(t["doc_id"], 1), k)
        part = t.filter(part_ids)
        part_dir = os.path.join(base, f"split{k}")
        os.makedirs(part_dir, exist_ok=True)
        pq.write_table(part, os.path.join(part_dir, "documents.parquet"))
        root = os.path.join(base, f"sub{k}")
        cfg = IndexConfig(
            index_root=root, num_partitions=4 + k,
            field_columns=("lang", "source"),
        )
        build_index(documents_as_pages(part_dir), cfg)
        roots.append(root)
    qcfg = IndexConfig(
        index_root=roots[0], num_partitions=4,
        field_columns=("lang", "source"),
    )
    svc = MultiIndexSearcherService(roots, cfg=qcfg)
    _MULTI_SERVICES[sf_dir] = svc
    return svc


_BLOCK_ENGINES: dict[str, Any] = {}


def _block_engine_for(sf_dir: str):
    """Block-structured index for the block-join entry: every document is a
    CHILD of a synthetic per-``source`` PARENT doc (shared ``blk`` field =
    the block key, ``kind`` = parent|child) — the flat-model encoding of a
    Lucene addDocuments block.  Parent text is the constant 'parentdoc'
    (disjoint from the probe vocabulary: the child query must never match
    a parent)."""
    eng = _BLOCK_ENGINES.get(sf_dir)
    if eng is not None:
        return eng
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    ids = t["doc_id"].to_pylist()
    sources = t["source"].to_pylist()
    # the SQL oracle joins on RAW source equality while the engine keys
    # blocks by the analyzed tokens of the blk field — equivalent only for
    # non-null single-token sources, so enforce that loudly here rather
    # than let the two sides silently diverge on an exotic corpus
    import re as _re

    bad = [s for s in sources if s is None or not _re.fullmatch(r"[a-z0-9]+", s)]
    if bad:
        raise ValueError(
            f"block_join entry requires non-null single-token sources; got "
            f"e.g. {bad[0]!r}"
        )
    distinct = sorted(set(sources))
    base = 1_700_000_000_000_000
    pages = pa.table(
        {
            "collection": ["default"] * (len(ids) + len(distinct)),
            "url": [f"doc://{i}" for i in ids]
            + [f"parent://{s}" for s in distinct],
            "warc_ts": pa.array(
                [base + int(i) for i in ids]
                + [base + 10**9 + k for k in range(len(distinct))],
                pa.timestamp("us"),
            ),
            "text": t["text"].to_pylist() + ["parentdoc"] * len(distinct),
            "blk": sources + distinct,
            "kind": ["child"] * len(ids) + ["parent"] * len(distinct),
        }
    )
    root = os.path.join(
        "/tmp/lucene_plugin_ray_entry_blocks",
        hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(root, ignore_errors=True)
    cfg = IndexConfig(
        index_root=root, num_partitions=8, field_columns=("blk", "kind")
    )
    build_index(pages, cfg)
    eng = (SearchEngine(root, cfg=cfg), cfg)
    _BLOCK_ENGINES[sf_dir] = eng
    return eng


def _search_all(sf_dir: str, query: str) -> pa.Table:
    """Engine search returning ALL hits as (doc_id, score-rounded-4)."""
    from lucene_plugin_ray.sources.pages import url_to_doc_id

    engine, cfg = _engine_for(sf_dir)
    res = engine.search(query, limit=1_000_000_000)
    return pa.table(
        {
            "doc_id": url_to_doc_id(res["url"].combine_chunks()),
            "score": pc.round(res["score"].combine_chunks(), ndigits=4),
        }
    ).sort_by("doc_id")


# deterministic query picks (exist in the seeded vocabulary of documents.text)
_TERM_Q = "spark"
_OR_Q = "spark window merge"

# function-score recency constants: warc_ts = doc_id + EPOCH (pages adapter),
# an explicit 'now' 1e9 µs past the epoch (> any testdata doc_id, so every
# age is positive), half-score decay at 1e8 µs of age
_PAGES_EPOCH_US = 1_600_000_000_000_000
_FN_NOW_US = _PAGES_EPOCH_US + 1_000_000_000
_FN_SCALE_US = 100_000_000
_AND_Q = "+spark +merge"
_FIELD_Q = "lang:de"
_RANGE_LO, _RANGE_HI = "src1", "src3"
_MLT_DOC = 7  # more_like_this probe document
# dataset_mix driver config: src0's raw quota (42) exceeds its count so the
# LEAST(count, ·) cap binds; the others bind on the weight share
_MIX_WEIGHTS = {"src0": 8.0, "src1": 4.0, "src2": 2.0, "src3": 1.0}
_MIX_TOTAL = 80
# extended grammar (Q8-Q10): adjacent in the seeded corpus / typo of 'spark'
_PHRASE_Q = '"spark merge"'
# rescore second-pass query: overlaps the OR query on 'merge', adds 'stream'
_RESCORE_Q = "merge stream"
# classification probes (classify_nb): analyzed against the text field;
# the second repeats 'merge' so per-OCCURRENCE likelihood weighting is
# exercised on both sides
_CLS_PROBES = ["spark window merge", "merge merge stream", "window table"]
# percolator registry (percolate): one of each boolean shape — bare OR,
# pure AND, OR + MUST_NOT, two-term OR
_PERC_QUERIES = [
    "spark", "+spark +merge", "spark window -merge", "merge stream",
    '"spark merge"',            # q4: exact-adjacency phrase percolation
    '+window +"spark merge"~2',  # q5: sloppy phrase AND term
]
# dismax probe: 'spark' fires only in text, 'de' only in lang — plus any
# text occurrences of 'de' the synthetic vocab produces
_DISMAX_Q = "spark de"
# stop word INSIDE the phrase → surviving terms (spark, merge) at query
# positions (0, 2): matches docs with exactly one position-consuming token
# between them (StopFilter enablePositionIncrements parity)
_PHRASE_GAP_Q = '"spark the merge"'
_SLOPPY_Q = '"spark merge"~2'  # Q14: exact hits weigh 1, near hits 1/(1+d)
_PREFIX_Q = "s*"          # expands to 6 vocabulary terms
_WILD_Q = "s?a*"          # expands to scan / small / spark
_FUZZY_Q = "spakr~1"      # transposition — true-Damerau distance 1 to spark
_REGEXP_Q = "/s[pt].[ra]+.*/"  # Q15 — matches spark/stream/... in the vocab
_REGEXP_RE2 = "s[pt].[ra]+.*"  # the same body for DuckDB regexp_full_match


# positioned token list: every NON-EMPTY token of the split keeps its slot
# (position = list index); stop words and over-long tokens become NULL so
# they consume a position but never match a term — the SQL twin of the
# engine's PRE-stop-filter positions (Lucene StopFilter posIncrement parity,
# functions/analysis.py::analyze_with_positions)
_SQL_POSITIONED_TOKS = (
    "list_transform("
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''),"
    " t -> CASE WHEN length(t) <= 255"
    " AND NOT list_contains({stop}, t) THEN t ELSE NULL END)"
)


def _phrase_bm25_sql(terms: list[str], offsets: list[int]) -> str:
    """Phrase BM25 (Q8): tf = slop-0 phrase frequency over the POSITIONED
    token stream (pre-stop-filter positions; removed tokens hold a NULL
    slot), term i must sit at start + offsets[i] (offsets[0] = 0; gaps
    where the query phrase carried stop words), idf = sum of the
    constituent terms' idfs — mirrors pipelines/query.py::
    _score_segment_taat's PhraseClause branch."""
    toks_expr = _SQL_POSITIONED_TOKS.format(stop=_SQL_STOP_LIST_LITERAL)
    max_off = offsets[-1]
    adj = " AND ".join(
        f"toks[i + {off}] = '{t}'" for off, t in zip(offsets, terms)
    )
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tl AS (SELECT doc_id, {toks_expr} AS toks FROM documents),
dl AS (SELECT doc_id, len(list_filter(toks, t -> t IS NOT NULL)) AS dl FROM tl),
alldl AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM alldl),
toks AS (SELECT doc_id, unnest(toks) AS term FROM tl),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term IN ({inlist}) GROUP BY term),
w AS (SELECT sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS w
      FROM df CROSS JOIN stats s),
pf AS (SELECT doc_id, len(list_filter(range(1, len(toks) - {max_off} + 1),
       i -> {adj})) AS pf FROM tl WHERE len(toks) >= {max_off} + 1)
SELECT pf.doc_id AS doc_id,
       round(w.w * (pf.pf * (1.2 + 1.0))
             / (pf.pf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)), 4) AS score
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s CROSS JOIN w
WHERE pf.pf > 0 ORDER BY doc_id
"""


def _sloppy_bm25_sql(t0: str, t1: str, slop: int, off1: int = 1) -> str:
    """Sloppy-phrase BM25 (Q14, two distinct terms): per anchor position of
    ``t0`` the move distance is min over ``t1`` positions of |p₁−off₁−p₀|
    (the shifted-position range of the Q14 contract specialized to k=2,
    off₁ = the second term's query position), anchors with d ≤ slop weigh
    1/(1+d); tf = the per-doc weight sum, idf = summed per-term idf —
    mirrors pipelines/query.py::_sloppy_phrase_weights.  Positions are
    pre-stop-filter (NULL slots for removed tokens), matching the index."""
    toks_expr = _SQL_POSITIONED_TOKS.format(stop=_SQL_STOP_LIST_LITERAL)
    md = (
        f"list_min(list_transform("
        f"list_filter(range(1, len(toks)+1), j -> toks[j] = '{t1}'),"
        f" pb -> abs(pb - {off1} - pa)))"
    )
    return f"""
WITH tl AS (SELECT doc_id, {toks_expr} AS toks FROM documents),
dl AS (SELECT doc_id, len(list_filter(toks, t -> t IS NOT NULL)) AS dl FROM tl),
alldl AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM alldl),
toks AS (SELECT doc_id, unnest(toks) AS term FROM tl),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term IN ('{t0}', '{t1}') GROUP BY term),
w AS (SELECT sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS w
      FROM df CROSS JOIN stats s),
pf AS (SELECT doc_id, coalesce(list_sum(list_transform(
         list_filter(range(1, len(toks)+1), i -> toks[i] = '{t0}'),
         pa -> CASE WHEN {md} <= {slop}
               THEN 1.0 / (1.0 + {md}) ELSE 0.0 END)), 0.0) AS pf
       FROM tl)
SELECT pf.doc_id AS doc_id,
       round(w.w * (pf.pf * (1.2 + 1.0))
             / (pf.pf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)), 4) AS score
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s CROSS JOIN w
WHERE pf.pf > 0 ORDER BY doc_id
"""


def _span_bm25_sql(
    pf_body: str, stat_terms: list[str], round_to: "int | None" = 4
) -> str:
    """Span-query BM25 scaffold (queries.spans family): ``pf_body`` is a
    DuckDB expression over the positioned token list ``toks`` (1-based
    list indices = engine position + 1) computing the per-doc span
    frequency; idf sums over ``stat_terms`` ONLY (a span_not's exclude
    terms mask matches but never contribute statistics — SpanWeight
    parity).  Mirrors pipelines/query.py::_span_postings + the
    SpanClause pseudo-term scoring contract."""
    toks_expr = _SQL_POSITIONED_TOKS.format(stop=_SQL_STOP_LIST_LITERAL)
    inlist = ", ".join(f"'{t}'" for t in stat_terms)
    return f"""
WITH tl AS (SELECT doc_id, {toks_expr} AS toks FROM documents),
dl AS (SELECT doc_id, len(list_filter(toks, t -> t IS NOT NULL)) AS dl FROM tl),
alldl AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM alldl),
toks AS (SELECT doc_id, unnest(toks) AS term FROM tl),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term IN ({inlist}) GROUP BY term),
w AS (SELECT sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS w
      FROM df CROSS JOIN stats s),
pf AS (SELECT doc_id, {pf_body} AS pf FROM tl)
SELECT pf.doc_id AS doc_id,
       {("round(" if round_to is not None else "(")}w.w * (pf.pf * (1.2 + 1.0))
             / (pf.pf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
       {f", {round_to})" if round_to is not None else ")"} AS score
FROM pf JOIN dl USING (doc_id) CROSS JOIN stats s CROSS JOIN w
WHERE pf.pf > 0 ORDER BY doc_id
"""


# span-query driver picks: the phrase pair (adjacency is non-trivial in the
# seeded corpus) plus window parameters small enough that every rule flips
# verdicts at sf0.001
_SPAN_SLOP = 2
_SPAN_FIRST_END = 8
_SPAN_NOT_PRE, _SPAN_NOT_POST = 1, 2


def _span_near_ordered_sql(t0: str, t1: str, slop: int, round_to: "int | None" = 4) -> str:
    """Ordered SpanNearQuery, k=2: per anchor pa of t0 the greedy
    completion is the NEAREST t1 strictly after pa (nd = min pb − pa);
    width = nd − 1 ≤ slop weighs 1/(1+width) = 1/nd."""
    nd = (
        f"list_min(list_transform("
        f"list_filter(range(1, len(toks)+1), j -> toks[j] = '{t1}' AND j > pa),"
        f" pb -> pb - pa))"
    )
    pf = (
        f"coalesce(list_sum(list_transform("
        f"list_filter(range(1, len(toks)+1), i -> toks[i] = '{t0}'),"
        f" pa -> CASE WHEN {nd} <= {slop} + 1"
        f" THEN 1.0 / {nd} ELSE 0.0 END)), 0.0)"
    )
    return _span_bm25_sql(pf, [t0, t1], round_to=round_to)


def _span_near_unordered_sql(t0: str, t1: str, slop: int, round_to: "int | None" = 4) -> str:
    """Unordered SpanNearQuery, k=2: per anchor pa of t0 the minimal
    window is the nearest t1 in EITHER direction (ad = min |pb − pa|);
    width = ad − 1 ≤ slop weighs 1/ad."""
    ad = (
        f"list_min(list_transform("
        f"list_filter(range(1, len(toks)+1), j -> toks[j] = '{t1}'),"
        f" pb -> abs(pb - pa)))"
    )
    pf = (
        f"coalesce(list_sum(list_transform("
        f"list_filter(range(1, len(toks)+1), i -> toks[i] = '{t0}'),"
        f" pa -> CASE WHEN {ad} <= {slop} + 1"
        f" THEN 1.0 / {ad} ELSE 0.0 END)), 0.0)"
    )
    return _span_bm25_sql(pf, [t0, t1], round_to=round_to)


def _span_first_sql(t: str, end: int) -> str:
    """SpanFirstQuery: engine position + 1 = 1-based list index, so the
    span-end condition pos + 1 ≤ end is exactly j ≤ end."""
    pf = (
        f"len(list_filter(range(1, len(toks)+1),"
        f" j -> toks[j] = '{t}' AND j <= {end})) * 1.0"
    )
    return _span_bm25_sql(pf, [t])


def _span_not_sql(t: str, ex: str, pre: int, post: int) -> str:
    """SpanNotQuery: anchors of ``t`` with no ``ex`` occurrence within
    [pa − pre, pa + post] (both sides in 1-based indices — the shift
    cancels); ``ex`` contributes no statistics."""
    pf = (
        f"len(list_filter(range(1, len(toks)+1),"
        f" pa -> toks[pa] = '{t}' AND len(list_filter("
        f"range(1, len(toks)+1), pb -> toks[pb] = '{ex}'"
        f" AND pb >= pa - {pre} AND pb <= pa + {post})) = 0)) * 1.0"
    )
    return _span_bm25_sql(pf, [t])


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the inverted index over the
    documents table and run a BM25 search; returns the hit table."""
    return _search_all("/root/testdata/sf0.001", _OR_Q)


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_plugin_ray.pipelines import relational, training

    def search_term(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _TERM_Q)

    def search_or(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _OR_Q)

    def search_and(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _AND_Q)

    def search_field(sf_dir: str) -> pa.Table:
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search(_FIELD_Q, limit=1_000_000_000)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_range(sf_dir: str) -> pa.Table:
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search(f"source:[{_RANGE_LO} TO {_RANGE_HI}]", limit=1_000_000_000)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": res["score"].combine_chunks(),
            }
        ).sort_by("doc_id")

    def search_phrase(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _PHRASE_Q)

    def search_phrase_gap(sf_dir: str) -> pa.Table:
        """StopFilter position-increment parity: the phrase text carries a
        stop word, so the surviving terms must sit exactly 2 positions
        apart in the PRE-stop-filter doc stream ('spark X merge' for any
        single position-consuming token X) — Lucene QueryParser keeps the
        analyzer's position gaps on both sides."""
        return _search_all(sf_dir, _PHRASE_GAP_Q)

    def search_sloppy(sf_dir: str) -> pa.Table:
        """Proximity phrase (Q14): '"spark merge"~2' — adjacent pairs weigh
        1, near pairs 1/(1+d) up to 2 moves; BM25 on the weight sum."""
        return _search_all(sf_dir, _SLOPPY_Q)

    def _span_table(res: pa.Table) -> pa.Table:
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def span_near(sf_dir: str) -> pa.Table:
        """Ordered SpanNearQuery ('spark' then 'merge' within slop 2):
        greedy nearest-completion anchors, 1/(1+width) weights, scored as
        a pseudo-term with summed constituent idfs."""
        engine, cfg = _engine_for(sf_dir)
        return _span_table(
            engine.span_near(
                ["spark", "merge"], slop=_SPAN_SLOP, limit=1_000_000_000
            )
        )

    def span_near_unordered(sf_dir: str) -> pa.Table:
        """Unordered SpanNearQuery ('merge' and 'spark' within slop 2,
        either order): minimal-window-per-anchor contract."""
        engine, cfg = _engine_for(sf_dir)
        return _span_table(
            engine.span_near(
                ["merge", "spark"], slop=_SPAN_SLOP, in_order=False,
                limit=1_000_000_000,
            )
        )

    def span_first(sf_dir: str) -> pa.Table:
        """SpanFirstQuery: 'spark' within the first 8 positions of the
        text field (pre-stop-filter ranks)."""
        engine, cfg = _engine_for(sf_dir)
        return _span_table(
            engine.span_first(
                "spark", _SPAN_FIRST_END, limit=1_000_000_000
            )
        )

    def span_not(sf_dir: str) -> pa.Table:
        """SpanNotQuery: 'spark' with no 'merge' within [p−1, p+2];
        'merge' masks matches but contributes no statistics."""
        engine, cfg = _engine_for(sf_dir)
        return _span_table(
            engine.span_not(
                "spark", "merge", pre=_SPAN_NOT_PRE, post=_SPAN_NOT_POST,
                limit=1_000_000_000,
            )
        )

    def search_regexp(sf_dir: str) -> pa.Table:
        """Regexp query (Q15): dictionary-expanded constant-score, anchored
        full-term match (Lucene RegexpQuery under CONSTANT_SCORE)."""
        return _search_all(sf_dir, _REGEXP_Q)

    def search_match_all(sf_dir: str) -> pa.Table:
        """MatchAllDocsQuery (*:*) composed with MUST_NOT: '-spark *:*' is
        the match-everything-except idiom — every live doc NOT containing
        the analyzed term, constant score 1.0 (classic QueryParser's
        field-*/term-* special case)."""
        return _search_all(sf_dir, "-spark *:*")

    def search_snippets(sf_dir: str) -> pa.Table:
        """Highlighting: every '"spark window merge"-OR' hit with its best
        8-token window snippet (distinct-scored-term maximizing, earliest
        tiebreak, 1-based start) — hit texts fetched with predicate
        pushdown, never the whole corpus."""
        import pyarrow.dataset as pads

        from lucene_plugin_ray.sources.pages import _doc_urls, url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        hits = engine.search(_OR_Q, limit=1_000_000_000)
        ids = url_to_doc_id(hits["url"].combine_chunks())
        fetched = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(ids),
        )
        texts = pa.table(
            {
                "url": _doc_urls(fetched["doc_id"].combine_chunks()),
                "text": fetched["text"],
            }
        )
        res = engine.snippets(
            _OR_Q, texts, k=1_000_000_000, window=8, hits=hits
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
                "start": res["start"],
                "n_terms": res["n_terms"],
                "snippet": res["snippet"],
            }
        ).sort_by("doc_id")

    def search_range_excl(sf_dir: str) -> pa.Table:
        """Exclusive range brackets: source:{src1 TO src3} — strict
        inequalities (classic QueryParser '{a TO b}' grammar)."""
        return _search_all(
            sf_dir, f"source:{{{_RANGE_LO} TO {_RANGE_HI}}}"
        )

    def search_range_open(sf_dir: str) -> pa.Table:
        """Open upper bound: source:[src3 TO *] (classic QueryParser '*'
        endpoint)."""
        return _search_all(sf_dir, f"source:[{_RANGE_HI} TO *]")

    def search_not(sf_dir: str) -> pa.Table:
        """MUST_NOT (Q11): BM25 on 'spark' over docs NOT containing
        'merge' — prohibited clauses exclude, never score."""
        return _search_all(sf_dir, "spark -merge")

    def search_group(sf_dir: str) -> pa.Table:
        """Groups (Q13): '(spark merge) AND window' — the group is a
        nested BooleanQuery; matching docs contain window AND at least one
        of {spark, merge}; the score sums every matching clause."""
        return _search_all(sf_dir, "(spark merge) AND window")

    def search_boost(sf_dir: str) -> pa.Table:
        """Boost (Q12): 'spark^2 merge' — spark's BM25 doubled."""
        return _search_all(sf_dir, "spark^2 merge")

    def search_synonyms(sf_dir: str) -> pa.Table:
        """Lucene SynonymQuery: group (spark, merge) scored as one
        pseudo-term — tf summed over members, idf from the max member df."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search(
            "spark", limit=1_000_000_000, synonyms={"spark": ["merge"]}
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_prefix(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _PREFIX_Q)

    def search_wildcard(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _WILD_Q)

    def search_fuzzy(sf_dir: str) -> pa.Table:
        return _search_all(sf_dir, _FUZZY_Q)

    def batch_search(sf_dir: str) -> pa.Table:
        """Partition-sharded batch query path (T2 at cluster scale): each
        actor pins an assigned partition subset; two-phase df-then-score
        keeps BM25 corpus-global (pipelines/sharded.py)."""
        from lucene_plugin_ray.pipelines.sharded import sharded_search
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)  # ensure the index exists
        qtable = pa.table(
            {
                "qid": pa.array([0, 1, 2], type=pa.int64()),
                "collection": ["default"] * 3,
                "query": [_TERM_Q, _AND_Q, _FIELD_Q],
                "k": pa.array([1_000_000_000] * 3, type=pa.int32()),
            }
        )
        t = sharded_search(
            cfg.index_root, qtable, cfg=cfg, num_shards=4, concurrency=2
        )
        return pa.table(
            {
                "qid": t["qid"],
                "doc_id": url_to_doc_id(t["url"].combine_chunks()),
                "score": pc.round(t["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by([("qid", "ascending"), ("doc_id", "ascending")])

    def search_facets(sf_dir: str) -> pa.Table:
        """Field faceting (Lucene SortedSetDocValues-facets style): lang
        counts over ALL docs matching the OR query, straight off the term
        dictionary (pipelines/query.py::SearchEngine.facets; the sharded
        twin is ShardedSearcherService.facets — equality pinned in
        tests/test_facets_mlt.py)."""
        engine, cfg = _engine_for(sf_dir)
        return engine.facets(_OR_Q, "lang")

    def facets_taxonomy(sf_dir: str) -> pa.Table:
        """Hierarchical (taxonomy) facets — lang→source rollup counts over
        the OR query's match set (pipelines/query.py::
        SearchEngine.facets_taxonomy; Lucene TaxonomyFacetCounts with a
        hierarchical dim).  Every matching doc rolls up into both its
        ("lang",) and ("lang", "source") path prefixes; the sharded twin
        is ShardedSearcherService.facets_taxonomy (identity pinned in
        tests/test_taxonomy.py)."""
        engine, cfg = _engine_for(sf_dir)
        return engine.facets_taxonomy(_OR_Q, ["lang", "source"])

    def term_vector_q(sf_dir: str) -> pa.Table:
        """Per-document term vector (IndexReader.getTermVector analogue,
        reconstructed from the inverted index — pipelines/query.py::
        SearchEngine.term_vector): doc 7's (term, tf, positions) rows,
        term asc; positions = comma-joined ascending PRE-stop-filter token
        ranks (StopFilter enablePositionIncrements parity).  The sharded
        twin routes to the one shard owning the url's partition
        (ShardedSearcherService.term_vector; identity pinned in
        tests/test_term_vector.py)."""
        engine, cfg = _engine_for(sf_dir)
        return engine.term_vector(f"doc://{_MLT_DOC:010d}")

    def more_like_this_q(sf_dir: str) -> pa.Table:
        """MoreLikeThis (like-text form): doc 7's text → top-10 tf·idf
        terms → SHOULD query, source doc excluded; all hits as
        (doc_id, score)."""
        import pyarrow.parquet as pq

        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filters=[("doc_id", "==", _MLT_DOC)],
        )
        res = engine.more_like_this(
            t["text"][0].as_py(),
            max_query_terms=10,
            limit=1_000_000_000,
            exclude_url=f"doc://{_MLT_DOC:010d}",
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def mlt_by_doc_q(sf_dir: str) -> pa.Table:
        """MoreLikeThis like(docId): term frequencies from the INDEXED
        doc 7's reconstructed term vector instead of re-analyzed text —
        identical selection contract, so the like-text oracle applies
        verbatim (analyze(text) tf == indexed tf for a live doc)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.more_like_this_url(
            f"doc://{_MLT_DOC:010d}", max_query_terms=10,
            limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def classify_knn_q(sf_dir: str) -> pa.Table:
        """KNN classification (KNearestNeighborClassifier): doc 7's text →
        MLT query (top-10 tf·idf terms, source excluded) → every hit votes
        its lang, weighted by integer 1e-4 units of its round-4 BM25 score
        (k unbounded — no top-k boundary, so the oracle is exact)."""
        import pyarrow.parquet as pq

        engine, cfg = _engine_for(sf_dir)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filters=[("doc_id", "==", _MLT_DOC)],
        )
        res = engine.classify_knn(
            t["text"][0].as_py(), "lang",
            k=1_000_000_000, max_query_terms=10,
            exclude_url=f"doc://{_MLT_DOC:010d}",
        )
        return res.sort_by("class")

    def search_count(sf_dir: str) -> pa.Table:
        """Count-only query (Lucene IndexSearcher.count): boolean match
        total, no scoring, no top-k."""
        engine, cfg = _engine_for(sf_dir)
        return pa.table(
            {"n_hits": pa.array([engine.count(_OR_Q)], pa.int64())}
        )

    def search_sorted(sf_dir: str) -> pa.Table:
        """Sort-by-field search (Lucene Sort(SortField('warc_ts', LONG,
        reverse))): all OR-query hits ordered by recency; rank is the
        global (warc_ts desc, doc_id asc) position."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_sorted(_OR_Q, limit=1_000_000_000)
        n = res.num_rows
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "ts_us": res["warc_ts"].combine_chunks(),
                "rank": pa.array(range(1, n + 1), pa.int64()),
            }
        ).sort_by("doc_id")

    def search_sorted_multi(sf_dir: str) -> pa.Table:
        """Multi-key field sort (Sort(SortField, SortField)): OR-query hits
        ordered (doc_len desc, warc_ts asc); rank is the global composite
        position (warc_ts unique ⇒ total order without the url tiebreak,
        so the SQL row_number reproduces it exactly)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_sorted_by(
            _OR_Q, [("doc_len", "desc"), ("warc_ts", "asc")],
            limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "dl": res["doc_len"].combine_chunks(),
                "ts_us": res["warc_ts"].combine_chunks(),
                "rank": pa.array(range(1, res.num_rows + 1), pa.int64()),
            }
        ).sort_by("doc_id")

    def search_sorted_str(sf_dir: str) -> pa.Table:
        """STRING field sort (SortField.Type.STRING over SortedDocValues
        ordinals reconstructed from the inverted index): OR-query hits
        ordered (source asc, warc_ts desc) — 'src10' < 'src2' pins the
        LEXICOGRAPHIC (not numeric) term order; warc_ts unique ⇒ the SQL
        row_number reproduces the rank exactly."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_sorted_by(
            _OR_Q, [("source", "asc"), ("warc_ts", "desc")],
            limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "source": res["source"].combine_chunks(),
                "ts_us": res["warc_ts"].combine_chunks(),
                "rank": pa.array(range(1, res.num_rows + 1), pa.int64()),
            }
        ).sort_by("doc_id")

    def search_sorted_str_after(sf_dir: str) -> pa.Table:
        """searchAfter(FieldDoc) on the STRING sort: anchor = the global
        (source asc, warc_ts desc) rank-n//3 row; only rows STRICTLY
        after it return — warc_ts unique, so the SQL rank reproduces the
        page exactly."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        sort = [("source", "asc"), ("warc_ts", "desc")]
        full = engine.search_sorted_by(_OR_Q, sort, limit=1_000_000_000)
        k = max(full.num_rows // 3, 1)
        ak = [full["source"][k - 1].as_py(), full["warc_ts"][k - 1].as_py()]
        au = full["url"][k - 1].as_py()
        res = engine.search_sorted_by(
            _OR_Q, sort, limit=1_000_000_000,
            after_keys=ak, after_url=au,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "source": res["source"].combine_chunks(),
                "ts_us": res["warc_ts"].combine_chunks(),
                "rank": pa.array(range(1, res.num_rows + 1), pa.int64()),
            }
        ).sort_by("doc_id")

    def index_stats(sf_dir: str) -> pa.Table:
        """Per-field index statistics (IndexReader numDocs / Terms.size /
        getSumDocFreq introspection): live docs, distinct terms and
        postings per analyzed field — all integer-exact against the token
        stream (the driver index carries no deletes, so stored == live)."""
        engine, cfg = _engine_for(sf_dir)
        t = engine.index_stats()
        return pa.table(
            {
                "field": t["field"],
                "docs": t["docs_alive"],
                "vocab": t["vocab"],
                "postings": t["postings"],
            }
        ).sort_by("field")

    def spell_suggest(sf_dir: str) -> pa.Table:
        """DirectSpellChecker analogue: live-vocab candidates within
        DL<=2 of the typo 'spakr', ranked (distance, df desc, term)."""
        engine, cfg = _engine_for(sf_dir)
        return engine.suggest("spakr", max_edits=2, k=5)

    def date_histogram(sf_dir: str) -> pa.Table:
        """Time-bucketed hit counts over the OR query's match set
        (date_histogram aggregation; warc_ts = epoch + doc_id µs)."""
        engine, cfg = _engine_for(sf_dir)
        return engine.date_histogram(_OR_Q, interval_us=100)

    def term_stats_q(sf_dir: str) -> pa.Table:
        import ray.data

        from lucene_plugin_ray.sources.pages import documents_as_pages
        from lucene_plugin_ray.stages.term_stats import term_stats

        cfg = IndexConfig(num_partitions=8)  # text field only
        out = term_stats(documents_as_pages(sf_dir), cfg)
        t = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow")]
        )
        t = t.filter(pc.equal(t["field"], "text"))
        return t.drop_columns(["field"]).sort_by("term")

    def doc_stats(sf_dir: str) -> pa.Table:
        return training.token_count(sf_dir)

    def facets_stats(sf_dir: str) -> pa.Table:
        """Numeric facet aggregation: doc_len (exact analyzed |D|) stats
        per lang over the 'spark' match set — count/min/max/sum, all
        integer-exact."""
        engine, cfg = _engine_for(sf_dir)
        return engine.facets_stats(_TERM_Q, "lang", value_source="doc_len")

    def search_grouped(sf_dir: str) -> pa.Table:
        """Grouped top-k (Lucene grouping module): 'spark window merge'
        grouped by source — top 3 docs per group, groups ranked by their
        head doc.  Ranks recomputed from ROUND-4 scores with doc_id-asc
        ties on BOTH sides (the hybrid-entry determinism contract), so a
        sub-round-off numpy/DuckDB divergence cannot flip a rank."""
        import numpy as np

        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_grouped(
            _OR_Q, "source", group_limit=1_000_000_000,
            docs_per_group=1_000_000_000,
        )
        ids = url_to_doc_id(res["url"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        grp = np.asarray(res["group"].to_pylist(), dtype=object)
        sc = np.round(
            res["score"].combine_chunks().to_numpy(zero_copy_only=False), 4
        )
        out = {"group": [], "group_rank": [], "doc_rank": [],
               "doc_id": [], "score": []}
        heads = []
        per_group = {}
        for g in sorted(set(grp.tolist())):
            m = grp == g
            gids, gsc = ids[m], sc[m]
            order = np.lexsort((gids, -gsc))[:3]
            per_group[g] = (gids[order], gsc[order])
            heads.append((g, gsc[order][0], gids[order][0]))
        heads.sort(key=lambda h: (-h[1], h[2]))
        for gi, (g, _, _) in enumerate(heads, start=1):
            gids, gsc = per_group[g]
            for di in range(len(gids)):
                out["group"].append(g)
                out["group_rank"].append(gi)
                out["doc_rank"].append(di + 1)
                out["doc_id"].append(int(gids[di]))
                out["score"].append(float(gsc[di]))
        return pa.table(
            {
                "group": pa.array(out["group"], pa.string()),
                "group_rank": pa.array(out["group_rank"], pa.int64()),
                "doc_rank": pa.array(out["doc_rank"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )

    def autocomplete(sf_dir: str) -> pa.Table:
        """Prefix autocompletion over the live text vocabulary: terms
        starting with 's', ranked (df desc, term asc), top 10."""
        engine, cfg = _engine_for(sf_dir)
        return engine.complete("s", k=10)

    def autocomplete_infix(sf_dir: str) -> pa.Table:
        """Infix autocompletion (AnalyzingInfixSuggester analogue): live
        text-vocabulary terms CONTAINING 'ar' anywhere, ranked
        (df desc, term asc), top 10 — a fragment no prefix scan can
        serve."""
        engine, cfg = _engine_for(sf_dir)
        return engine.complete_infix("ar", k=10)

    def search_mm(sf_dir: str) -> pa.Table:
        """minimum_should_match (BooleanQuery.setMinimumNumberShouldMatch):
        'spark window merge' requiring ≥ 2 of the 3 SHOULD terms — scores
        stay the plain BM25 sums over matching terms."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search(_OR_Q, min_should_match=2, limit=1_000_000_000)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def _search_all_sim(sf_dir: str, similarity: str) -> pa.Table:
        """The _search_all shape through a non-default similarity engine
        (IndexSearcher.setSimilarity): SAME index, different scorer —
        the engine is constructed over the root _engine_for already built,
        cached per (sf_dir, similarity)."""
        from lucene_plugin_ray.pipelines.query import SearchEngine
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        _, cfg = _engine_for(sf_dir)
        key = (sf_dir, similarity)
        eng = _SIM_ENGINES.get(key)
        if eng is None:
            eng = SearchEngine(
                cfg.index_root, cfg=cfg, similarity=similarity
            )
            _SIM_ENGINES[key] = eng
        res = eng.search(_OR_Q, limit=1_000_000_000)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_classic(sf_dir: str) -> pa.Table:
        """ClassicSimilarity (Lucene TF-IDF): sqrt(tf) · (ln((N+1)/(df+1))
        + 1)² / sqrt(dl) per matching term, over the SAME index the BM25
        entries search — similarity is a searcher property."""
        return _search_all_sim(sf_dir, "classic")

    def search_lmdirichlet(sf_dir: str) -> pa.Table:
        """LMDirichletSimilarity(mu=2000): ln(1 + tf/(mu·ttf/sum_dl)) +
        ln(mu/(dl+mu)), clamped at 0 per term — docs whose every term
        clamps still match at score 0.0 (Lucene parity)."""
        return _search_all_sim(sf_dir, "lmdirichlet")

    def search_jelinekmercer(sf_dir: str) -> pa.Table:
        """LMJelinekMercerSimilarity(λ=0.1): ln(1 + (0.9·tf/dl)/
        (0.1·ttf/sum_dl)) per matching term — strictly positive, no clamp
        row like lmdirichlet's."""
        return _search_all_sim(sf_dir, "lmjelinekmercer")

    def search_dfr(sf_dir: str) -> pa.Table:
        """DFR I(n)L2 (BasicModelIn · AfterEffectL · NormalizationH2(c=1)):
        tfn = tf·log2(1+avgdl/dl); score = tfn/(1+tfn) ·
        log2((N+1)/(df+0.5)) per matching term."""
        return _search_all_sim(sf_dir, "dfr_inl2")

    def search_boolean_sim(sf_dir: str) -> pa.Table:
        """BooleanSimilarity: every matching term contributes exactly 1.0
        — the scored OR degenerates to a coordination count."""
        return _search_all_sim(sf_dir, "boolean")

    def search_dismax(sf_dir: str) -> pa.Table:
        """Multi-field DisjunctionMaxQuery (Solr dismax): 'spark de' over
        fields text (w=1.0) and lang (w=2.0), tie_breaker 0.3 — per term
        and doc, max(weighted field legs) + 0.3·(sum − max)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search(
            _DISMAX_Q,
            fields={"text": 1.0, "lang": 2.0},
            tie_breaker=0.3,
            limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def hybrid_search_q(sf_dir: str) -> pa.Table:
        """Hybrid retrieval: BM25('spark window merge') leg + cosine leg vs
        the embedding of vec_id 0, RRF-fused (k_leg=20 per leg, rrf_k=60,
        final top-10 by rrf desc / doc_id asc)."""
        from lucene_plugin_ray.pipelines.hybrid import hybrid_search

        engine, cfg = _engine_for(sf_dir)
        return hybrid_search(engine, sf_dir, _OR_Q, qvec_id=0, k=10, k_leg=20)

    def search_after(sf_dir: str) -> pa.Table:
        """Deep pagination (IndexSearcher.searchAfter analogue): every hit
        STRICTLY after a threshold anchor under the (score desc, url asc)
        total order.  The anchor score is the k-th largest ROUND-4 score
        (k = max(1, n//3) — the value at rank k is deterministic even when
        round-4 ties straddle the rank) plus half a rounding step
        (0.00005), so the engine's full-precision predicate
        ``score < anchor`` and the oracle's round-4 predicate
        ``round4(score) <= round4@k`` select the same doc set; no top-k
        boundary (limit=ALL), so no tie-ordering sensitivity.  Exact
        page-by-page fidelity (pages concatenate to search(limit=Σ))
        is pinned by tests/test_search_after.py with the engine's own
        full-precision anchors."""
        import numpy as np

        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        full = engine.search(_OR_Q, limit=1_000_000_000)
        sc4 = np.round(full["score"].to_numpy(), 4)
        k = max(1, full.num_rows // 3)
        anchor = float(sc4[k - 1]) + 0.00005
        res = engine.search_after(_OR_Q, anchor, "", limit=1_000_000_000)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def check_index_q(sf_dir: str) -> pa.Table:
        """CheckIndex sweep, SQL-checkable census (VERDICT r03 item 7):
        the full invariant suite RUNS over every segment of the driver
        index (any defect flips ``all_ok`` → hash mismatch); the emitted
        row is the corpus-level census DuckDB can recompute from the raw
        table — n_docs (dedup by url is vacuous: urls unique), n_postings
        (Σ distinct (field, doc, term) over text/lang/source under the
        analyzer spec), plus the build constants (generation 0, P=8).
        Per-partition n_terms stays in the pytest referee
        (tests/test_check.py) — the fnv1a partitioner isn't
        SQL-expressible."""
        from lucene_plugin_ray.pipelines.check import check_index

        _engine, cfg = _engine_for(sf_dir)
        t = check_index(cfg.index_root)
        man = t.filter(pc.equal(t["partition"], -1)).to_pylist()[0]
        n_parts = pc.sum(
            pc.cast(pc.greater_equal(t["partition"], 0), pa.int64())
        ).as_py()
        return pa.table(
            {
                "generation": pa.array([int(man["generation"])], pa.int64()),
                "n_partitions": pa.array([int(n_parts)], pa.int64()),
                "n_docs": pa.array([int(man["n_docs"])], pa.int64()),
                "n_postings": pa.array([int(man["n_postings"])], pa.int64()),
                "all_ok": pa.array(
                    [bool(pc.min(t["ok"]).as_py())], pa.bool_()
                ),
            }
        )

    def check_index_partitions_q(sf_dir: str) -> pa.Table:
        """Per-partition CheckIndex census whose oracle RECOMPUTES THE
        PARTITIONER IN SQL (round 4): DuckDB derives every doc's
        partition bit-exactly — FNV-1a-64 over 'default\\x00' || url via
        a recursive CTE, then the mix64 finalizer with 32-bit-split
        modular multiplications (HUGEINT would overflow on the 64-bit
        constants) — and aggregates docs / distinct (field, term) /
        distinct (field, doc, term) per partition.  Hash-equality means
        the engine's hash partitioning, per-partition doc routing AND
        per-partition vocabulary/posting counts are all externally
        verified; ``ok`` carries the real invariant sweep's per-segment
        verdict (functions/hashing.py:partition_of_key is the function
        under test)."""
        from lucene_plugin_ray.pipelines.check import check_index

        _engine, cfg = _engine_for(sf_dir)
        t = check_index(cfg.index_root)
        seg = t.filter(pc.greater_equal(t["partition"], 0))
        return pa.table(
            {
                "partition": pc.cast(seg["partition"].combine_chunks(), pa.int64()),
                "n_docs": seg["n_docs"].combine_chunks(),
                "n_terms": seg["n_terms"].combine_chunks(),
                "n_postings": seg["n_postings"].combine_chunks(),
                "ok": seg["ok"].combine_chunks(),
            }
        ).sort_by("partition")

    def repartition_search_q(sf_dir: str) -> pa.Table:
        """Repartitioning exactness: the driver index (8 partitions)
        re-sharded to 5 from its inverted data alone (no corpus re-read),
        then searched — the result must hash-match the single-corpus BM25
        oracle (the search_term oracle verbatim: the live doc set, hence
        every statistic, is unchanged by the re-shard)."""
        import shutil
        import tempfile

        from lucene_plugin_ray.pipelines.query import SearchEngine
        from lucene_plugin_ray.pipelines.repartition import repartition_index
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        _eng, cfg = _engine_for(sf_dir)
        dst = tempfile.mkdtemp(prefix="lpr_repart_")
        try:
            shutil.rmtree(dst, ignore_errors=True)
            repartition_index(cfg.index_root, dst, 5)
            dcfg = IndexConfig(
                index_root=dst, num_partitions=5,
                field_columns=cfg.field_columns,
            )
            res = SearchEngine(dst, cfg=dcfg).search(
                _TERM_Q, limit=1_000_000_000
            )
            return pa.table(
                {
                    "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                    "score": pc.round(
                        res["score"].combine_chunks(), ndigits=4
                    ),
                }
            ).sort_by("doc_id")
        finally:
            shutil.rmtree(dst, ignore_errors=True)

    def merge_search_q(sf_dir: str) -> pa.Table:
        """addIndexes exactness: the documents corpus split by doc_id
        parity into TWO independently built roots (different partition
        counts), physically merged into one new index (merge_indexes),
        then searched — hash-matches the single-corpus BM25 oracle (the
        search_term oracle verbatim: the merged live doc set IS the
        union corpus)."""
        import shutil
        import tempfile

        from lucene_plugin_ray.pipelines.build import build_index
        from lucene_plugin_ray.pipelines.query import SearchEngine
        from lucene_plugin_ray.pipelines.repartition import merge_indexes
        from lucene_plugin_ray.sources.pages import (
            documents_as_pages,
            url_to_doc_id,
        )

        import os

        base = tempfile.mkdtemp(prefix="lpr_merge_")
        try:
            ds = documents_as_pages(sf_dir)
            tbl = pa.concat_tables(
                list(ds.iter_batches(batch_format="pyarrow"))
            )
            ids = url_to_doc_id(tbl["url"].combine_chunks())
            even = pc.equal(pc.bit_wise_and(ids, 1), 0)
            roots = []
            for k, part in enumerate(
                (tbl.filter(even), tbl.filter(pc.invert(even)))
            ):
                root = os.path.join(base, f"src{k}")
                c = IndexConfig(
                    index_root=root, num_partitions=3 + k,
                    field_columns=("lang", "source"),
                )
                build_index(part, c)
                roots.append(root)
            dst = os.path.join(base, "merged")
            merge_indexes(roots, dst, num_partitions=6)
            dcfg = IndexConfig(
                index_root=dst, num_partitions=6,
                field_columns=("lang", "source"),
            )
            res = SearchEngine(dst, cfg=dcfg).search(
                _TERM_Q, limit=1_000_000_000
            )
            return pa.table(
                {
                    "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                    "score": pc.round(
                        res["score"].combine_chunks(), ndigits=4
                    ),
                }
            ).sort_by("doc_id")
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def multireader_search_q(sf_dir: str) -> pa.Table:
        """MultiReader federation exactness: the documents corpus split by
        doc_id parity into TWO independently built roots (different
        partition counts), searched through MultiIndexSearcherService —
        the federation-global BM25 must hash-match the single-corpus SQL
        oracle (the search_term oracle verbatim)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        svc = _multi_service_for(sf_dir)
        q = pa.table(
            {"qid": [0], "query": [_TERM_Q], "k": [1_000_000_000]}
        )
        res = svc.search_batch(q)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def block_join_q(sf_dir: str) -> pa.Table:
        """ToParentBlockJoinQuery (ScoreMode.None — constant-score parent
        hits, the SQL-exact mode; the four scored modes are pinned against
        a brute-force BM25 oracle in tests/test_block_join.py): blocks are
        derived from the documents table — every document is a child of a
        synthetic per-``source`` parent doc, so the result is the parents
        of sources with >= 1 document matching the probe term."""
        eng, _cfg = _block_engine_for(sf_dir)
        t = eng.block_join_parents(
            _TERM_Q, "kind:parent", "blk", score_mode="none",
            limit=1_000_000_000,
        )
        return t.select(["url", "score"]).sort_by("url")

    def index_replicate_q(sf_dir: str) -> pa.Table:
        """Replicator sweep with a SQL-checkable census (VERDICT r03
        item 7): the driver index is replicated segment-by-segment to a
        fresh root, the replica must answer a term query IDENTICALLY
        (hits, scores, order — asserted in-process; a mismatch raises and
        the driver records the failure), and the output is the per-kind
        artifact-count census whose oracle is the constant table derived
        from the build config (see below)."""
        import shutil
        import tempfile

        from lucene_plugin_ray.pipelines.query import SearchEngine
        from lucene_plugin_ray.pipelines.replicate import replicate_index

        engine, cfg = _engine_for(sf_dir)
        dst = tempfile.mkdtemp(prefix="lpr_replica_")
        try:
            t = replicate_index(cfg.index_root, dst)
            cfg2 = IndexConfig(
                index_root=dst,
                num_partitions=cfg.num_partitions,
                field_columns=cfg.field_columns,
            )
            a = engine.search(_TERM_Q, limit=1_000_000_000)
            b = SearchEngine(dst, cfg=cfg2).search(_TERM_Q, limit=1_000_000_000)
            if not a.equals(b):
                raise AssertionError(
                    "replica answered the probe query differently from the "
                    "source index"
                )
        finally:
            shutil.rmtree(dst, ignore_errors=True)
        # per-kind artifact census (VERDICT r03 item 7): counts DuckDB can
        # state as constants derived from the build config — P=8 segments
        # of 5 files each (postings.bin, positions.bin, terms.parquet,
        # docs.parquet, meta.json) + 1 manifest of 1 file, nothing skipped
        # on a fresh destination.  A missed/extra artifact or file changes
        # a count → hash mismatch.
        agg: dict[str, list[int]] = {}
        for k, f, sk in zip(
            t["kind"].to_pylist(), t["files"].to_pylist(),
            t["skipped"].to_pylist(),
        ):
            a = agg.setdefault(k, [0, 0, 0])
            a[0] += 1
            a[1] += int(f)
            a[2] += int(bool(sk))
        kinds = sorted(agg)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "n_artifacts": pa.array([agg[k][0] for k in kinds], pa.int64()),
                "total_files": pa.array([agg[k][1] for k in kinds], pa.int64()),
                "n_skipped": pa.array([agg[k][2] for k in kinds], pa.int64()),
            }
        )

    def search_sorted_after(sf_dir: str) -> pa.Table:
        """Sorted deep pagination (searchAfter(FieldDoc) analogue): the OR
        query's recency-ordered hits STRICTLY after the row at global rank
        max(1, n//3) under (warc_ts desc, url asc).  warc_ts is unique in
        the driver corpus (epoch + doc_id µs), so the engine's (ts, url)
        anchor and the oracle's ts-threshold select the same page and the
        rank column is tie-free; tie semantics are pinned by
        tests/test_search_after.py fixtures instead."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        full = engine.search_sorted(_OR_Q, limit=1_000_000_000)
        pos = max(1, full.num_rows // 3) - 1
        res = engine.search_sorted(
            _OR_Q, limit=1_000_000_000,
            after_ts=full["warc_ts"][pos].as_py(),
            after_url=full["url"][pos].as_py(),
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "ts_us": res["warc_ts"].combine_chunks(),
                "rank": pa.array(range(1, res.num_rows + 1), pa.int64()),
            }
        ).sort_by("doc_id")

    def search_rescore(sf_dir: str) -> pa.Table:
        """Two-pass rescoring (Lucene QueryRescorer): top-window hits of
        the OR query re-ranked by first + 0.5 · second where second is the
        rescore query's BM25 over the window only.  The window here is the
        FULL match set (limit=ALL) so the hash comparison has no top-k
        boundary; windowed semantics are pinned by tests/test_rescore.py.
        0.5 is exactly representable, so engine (numpy) and oracle
        (DuckDB) compute bit-identical float64 combines."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.rescore(
            _OR_Q, _RESCORE_Q, window_size=1_000_000_000, weight=0.5,
            limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_filtered(sf_dir: str) -> pa.Table:
        """Filtered search (IndexSearcher.search(Query, Filter, n) /
        FILTER occur): BM25 of the OR query restricted to docs matching
        the filter query — scores from the query alone, the filter only
        constrains the match set.  Full match set (no top-k boundary)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_filtered(_OR_Q, _RESCORE_Q, limit=1_000_000_000)
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_join(sf_dir: str) -> pa.Table:
        """Query-time join (JoinUtil.createJoinQuery, ScoreMode.Max):
        from-side = the AND query over text, joined through lang — each
        lang carried by a matching doc is scored by its BEST matching
        doc's BM25 (max is order-free, so engine and oracle agree
        bit-for-bit pre-round); to-side = every doc of a joined lang,
        carrying that lang's score.  Full result set (no top-k)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_join(
            _AND_Q, "lang", "lang", score_mode="max", limit=1_000_000_000
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def drill_sideways(sf_dir: str) -> pa.Table:
        """DrillSideways (Lucene facets module): 'spark' drilled down to
        lang=de AND source∈{src3,src5}; per dim the SIDEWAYS facet counts
        — that dim's own filter removed, every other dim kept — flattened
        to (dim, value, count).  Pure integer counts, no float
        sensitivity."""
        engine, cfg = _engine_for(sf_dir)
        _hits, counts = engine.drill_sideways(
            _TERM_Q, {"lang": "de", "source": ["src3", "src5"]}
        )
        dims, vals, cnts = [], [], []
        for f in sorted(counts):
            t = counts[f]
            for v, c in zip(t["value"].to_pylist(), t["count"].to_pylist()):
                dims.append(f)
                vals.append(v)
                cnts.append(c)
        return pa.table(
            {
                "dim": pa.array(dims, pa.string()),
                "value": pa.array(vals, pa.string()),
                "count": pa.array(cnts, pa.int64()),
            }
        ).sort_by([("dim", "ascending"), ("value", "ascending")])

    def classify_nb(sf_dir: str) -> pa.Table:
        """Naive-Bayes classification off pure index statistics (Lucene
        SimpleNaiveBayesClassifier analogue): three probe texts scored
        against every lang class — priors from class doc counts,
        likelihoods from (text token ∧ class) posting intersections with
        add-one smoothing over the distinct text vocabulary."""
        engine, cfg = _engine_for(sf_dir)
        parts = []
        for i, p in enumerate(_CLS_PROBES):
            t = engine.classify(p, "lang")
            parts.append(
                pa.table(
                    {
                        "probe_id": pa.array([i] * t.num_rows, pa.int64()),
                        "class": t["class"],
                        "score": pc.round(t["score"].combine_chunks(), ndigits=4),
                    }
                )
            )
        return pa.concat_tables(parts).sort_by(
            [("probe_id", "ascending"), ("class", "ascending")]
        )

    def facet_ranges(sf_dir: str) -> pa.Table:
        """Numeric range faceting (LongRangeFacetCounts): per-range counts
        of docs matching 'spark' bucketed by analyzed doc_len — open,
        half-open and overlapping (whole-line 'all') ranges; integer
        counts, no float sensitivity."""
        engine, cfg = _engine_for(sf_dir)
        return engine.facet_ranges(
            _TERM_Q,
            [("short", None, 120), ("mid", 120, 300),
             ("long", 300, None, True, False), ("all", None, None, True, True)],
            value_source="doc_len",
        )

    def search_expr_range(sf_dir: str) -> pa.Table:
        """FunctionRangeQuery: the search_expr expression restricted to
        value in [0.25, 0.6] — a non-trivial slice of the value
        distribution at both scales; open-end semantics tested in pytest."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_expression_range(
            _OR_Q, "_score * k / (k + doc_len) + sqrt(doc_len) * 0.001",
            lo=0.25, hi=0.6, bindings={"k": 50.0}, limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_common(sf_dir: str) -> pa.Table:
        """CommonTermsQuery at max_term_frequency=0.78: the OR terms split
        by global df (both groups non-empty at sf0.001 AND sf0.01 — the
        cutoff sits between the Zipf-head dfs); docs must match >= 1
        low-df term, high-df terms add score only."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_common(
            _OR_Q, max_term_frequency=0.78, limit=1_000_000_000
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_boosting(sf_dir: str) -> pa.Table:
        """BoostingQuery: 'spark merge' hits, scores multiplied by 0.25
        (exactly representable) where 'window' also matches — the demoted
        docs stay in the result set (context demotion, not exclusion)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_boosting(
            "spark merge", "window", demote=0.25, limit=1_000_000_000
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_surround(sf_dir: str) -> pa.Table:
        """Surround-language query (queryparser-surround module):
        'spark 3w merge OR window 2n stream' — an OR of an ordered and an
        unordered proximity (distance n = slop n-1); per-doc score = sum
        of the matching span pseudo-term scores."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_surround(
            "spark 3w merge OR window 2n stream", limit=1_000_000_000
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def facets_surround(sf_dir: str) -> pa.Table:
        """Proximity-conditioned facet counts: per-source doc counts over
        the 'spark 3w merge' ordered-near match set — (value, count),
        (count desc, value asc)."""
        engine, cfg = _engine_for(sf_dir)
        return engine.facets("spark 3w merge", "source", syntax="surround")

    def count_surround(sf_dir: str) -> pa.Table:
        """Score-free span counting (IndexSearcher.count over a surround
        query): docs with 'spark' within 3 positions before 'merge',
        minus those also containing 'window' — one integer row."""
        engine, cfg = _engine_for(sf_dir)
        n = engine.count("spark 3w merge NOT window", syntax="surround")
        return pa.table({"n": pa.array([n], pa.int64())})

    def search_diversified(sf_dir: str) -> pa.Table:
        """Diversified top-k (misc DiversifiedTopDocsCollector): at most 3
        hits per source over the OR query — greedy selection under the
        (score desc, url asc) total order equals the rank-within-key <= 3
        filter (url = doc://{doc_id:010d}, so the SQL doc_id tiebreak
        matches the engine's url tiebreak exactly)."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_diversified(
            _OR_Q, "source", max_per_key=3, limit=1_000_000_000
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
                "key": res["key"].combine_chunks(),
            }
        ).sort_by("doc_id")

    def search_expr(sf_dir: str) -> pa.Table:
        """Expression-scored search (Lucene expressions module /
        JavascriptCompiler): '_score * k / (k + doc_len) + sqrt(doc_len)
        * 0.001' with the binding k=50 — sqrt is correctly rounded by
        IEEE and every other op is plain float64 arithmetic in the SAME
        tree shape on both sides, so only the BM25 sum order differs;
        round-4 on the final value.  limit=ALL: no top-k boundary."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_expression(
            _OR_Q, "_score * k / (k + doc_len) + sqrt(doc_len) * 0.001",
            bindings={"k": 50.0}, limit=1_000_000_000,
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def search_function(sf_dir: str) -> pa.Table:
        """Function-scored search (FunctionScoreQuery recency decay):
        final = bm25 · scale/(scale + age_us), age = now − warc_ts with
        warc_ts = doc_id + EPOCH (the pages adapter contract) and an
        explicit now = EPOCH + 1e9 µs.  The weight is the same float64
        expression on both sides, so only the BM25 sum order differs —
        round-4 on the FINAL value, like every search entry.  limit=ALL:
        no top-k boundary."""
        from lucene_plugin_ray.sources.pages import url_to_doc_id

        engine, cfg = _engine_for(sf_dir)
        res = engine.search_function(
            _OR_Q, _FN_NOW_US, _FN_SCALE_US, limit=1_000_000_000
        )
        return pa.table(
            {
                "doc_id": url_to_doc_id(res["url"].combine_chunks()),
                "score": pc.round(res["score"].combine_chunks(), ndigits=4),
            }
        ).sort_by("doc_id")

    def top_terms(sf_dir: str) -> pa.Table:
        """Highest-df vocabulary terms (Lucene misc HighFreqTerms,
        DOCFREQ_ORDER): top 25 under the exact integer (df desc,
        term asc) rank — the tie order is deterministic on both sides."""
        engine, cfg = _engine_for(sf_dir)
        return engine.top_terms(k=25)

    return {
        "search_after": search_after,
        "search_sorted_after": search_sorted_after,
        "check_index": check_index_q,
        "check_index_partitions": check_index_partitions_q,
        "index_replicate": index_replicate_q,
        "block_join": block_join_q,
        "multireader_search": multireader_search_q,
        "repartition_search": repartition_search_q,
        "merge_search": merge_search_q,
        "search_rescore": search_rescore,
        "search_filtered": search_filtered,
        "search_join": search_join,
        "drill_sideways": drill_sideways,
        "classify_nb": classify_nb,
        "classify_knn": classify_knn_q,
        "facet_ranges": facet_ranges,
        "search_function": search_function,
        "search_expr": search_expr,
        "search_expr_range": search_expr_range,
        "search_common": search_common,
        "search_diversified": search_diversified,
        "search_surround": search_surround,
        "count_surround": count_surround,
        "facets_surround": facets_surround,
        "search_boosting": search_boosting,
        "top_terms": top_terms,
        "search_term": search_term,
        "search_or": search_or,
        "search_and": search_and,
        "search_field": search_field,
        "search_range": search_range,
        "search_phrase": search_phrase,
        "search_phrase_gap": search_phrase_gap,
        "search_sloppy": search_sloppy,
        "span_near": span_near,
        "span_near_unordered": span_near_unordered,
        "span_first": span_first,
        "span_not": span_not,
        "search_range_excl": search_range_excl,
        "search_range_open": search_range_open,
        "search_regexp": search_regexp,
        "search_match_all": search_match_all,
        "search_snippets": search_snippets,
        "search_prefix": search_prefix,
        "search_wildcard": search_wildcard,
        "search_fuzzy": search_fuzzy,
        "search_not": search_not,
        "search_group": search_group,
        "search_boost": search_boost,
        "search_synonyms": search_synonyms,
        "search_dismax": search_dismax,
        "search_mm": search_mm,
        "search_classic": search_classic,
        "search_lmdirichlet": search_lmdirichlet,
        "search_jelinekmercer": search_jelinekmercer,
        "search_dfr": search_dfr,
        "search_boolean_sim": search_boolean_sim,
        "autocomplete": autocomplete,
        "autocomplete_infix": autocomplete_infix,
        "search_grouped": search_grouped,
        "facets_stats": facets_stats,
        "search_facets": search_facets,
        "facets_taxonomy": facets_taxonomy,
        "search_count": search_count,
        "search_sorted": search_sorted,
        "search_sorted_multi": search_sorted_multi,
        "search_sorted_str": search_sorted_str,
        "search_sorted_str_after": search_sorted_str_after,
        "index_stats": index_stats,
        "spell_suggest": spell_suggest,
        "date_histogram": date_histogram,
        "more_like_this": more_like_this_q,
        "mlt_by_doc": mlt_by_doc_q,
        "term_vector": term_vector_q,
        "hybrid_search": hybrid_search_q,
        "batch_search": batch_search,
        "term_stats": term_stats_q,
        "token_count": doc_stats,
        "quality_score": training.quality_score,
        "fingerprint": training.fingerprint,
        "dedup_exact": training.dedup_exact,
        "dedup_minhash": training.dedup_minhash,
        "jaccard_adjacent": training.jaccard_adjacent,
        "dedup_clusters": training.dedup_clusters,
        "simhash": training.simhash,
        "simhash_pairs": training.simhash_pairs,
        "embedding_dedup": training.embedding_dedup,
        "ann_topk": training.ann_topk,
        "ann_ivf": training.ann_ivf,
        "multimodal_features": training.multimodal_features,
        "media_decode": training.media_decode,
        "events_latest": training.events_latest,
        "events_window": training.events_window,
        "events_asof": training.events_asof,
        "events_band_join": training.events_band_join,
        "events_sessionize": training.events_sessionize,
        "ann_lsh": training.ann_lsh,
        "corpus_curation": training.corpus_curation,
        "dedup_ngram_spans": training.dedup_ngram_spans,
        "doc_dup_stats": training.doc_dup_stats,
        "token_count_bpe": training.token_count_bpe,
        "lang_id": training.lang_id,
        "repetition_stats": training.repetition_stats,
        "chunk_text": training.chunk_text,
        "text_clean": training.text_clean,
        "pii_redact": lambda sf: training.pii_redact(sf, inject=True),
        "gopher_quality": lambda sf: training.gopher_quality(sf, inject=True),
        "c4_filter": lambda sf: training.c4_filter(sf, inject=True),
        "percolate": lambda sf: training.percolate(sf, queries=_PERC_QUERIES),
        # iterative/stateful (tokenizer training) — no SQL oracle; referee
        # is the brute-force reference in tests/test_curation_ops.py
        "bpe_fit": lambda sf: training.bpe_fit(sf, n_merges=50),
        "bpe_encode": lambda sf: training.bpe_encode(sf, n_merges=50),
        "dataset_split": training.dataset_split,
        "decontaminate": training.decontaminate,
        "events_props_extract": training.events_props_extract,
        "pack_sequences": training.pack_sequences,
        "ngram_counts": training.ngram_counts,
        "source_stats": training.source_stats,
        "source_sample": training.source_sample,
        "tfidf_topk": training.tfidf_topk,
        "embedding_cluster": training.embedding_cluster,
        "semantic_dedup": training.semantic_dedup,
        "paragraph_dedup": training.paragraph_dedup,
        "length_quantiles": training.length_quantiles,
        "value_quantiles_sketch": training.value_quantiles_sketch,
        "events_rolling": training.events_rolling,
        "ann_pq": training.ann_pq,
        "knn_graph": lambda sf: training.knn_graph(sf, k=5, strategy="exact"),
        "knn_graph_lsh": lambda sf: training.knn_graph(sf, k=5, strategy="bucketed"),
        "quality_classifier": training.quality_classifier,
        "revenue_by_nation": relational.revenue_by_nation,
        "pricing_summary": relational.pricing_summary,
        "top_suppliers": relational.top_suppliers,
        "order_line_rollup": relational.order_line_rollup,
        "distinct_users": relational.distinct_users_by_type,
        "charlm_logprob": training.charlm_logprob,
        "length_rank": training.length_rank,
        "revenue_by_part_type": relational.revenue_by_part_type,
        "revenue_by_region": relational.revenue_by_region,
        "minhash_clusters": training.minhash_clusters,
        "deterministic_shuffle": training.deterministic_shuffle,
        "events_hopping": training.events_hopping,
        "user_funnel": relational.user_funnel,
        "distinct_users_hll": relational.distinct_users_hll,
        "heavy_hitters": lambda sf: training.heavy_hitters(sf, k=28),
        "decontaminate_bloom": training.decontaminate_bloom,
        "dataset_mix": lambda sf: training.dataset_mix(
            sf, weights=_MIX_WEIGHTS, total=_MIX_TOTAL
        ),
        "winnow_fingerprints": lambda sf: training.winnow_fingerprints(
            sf, k=5, w=4
        ),
        "dsir_weights": training.dsir_weights,
        "collocations": lambda sf: training.collocations(sf, min_count=5),
    }


def oracle_sql() -> dict[str, str]:
    term_terms = analyze(_TERM_Q)
    or_terms = analyze(_OR_Q)
    or_inlist = ", ".join(f"'{t}'" for t in or_terms)
    and_terms = analyze(_AND_Q.replace("+", " "))

    sql: dict[str, str] = {}
    sql["search_term"] = _bm25_sql(term_terms)
    # MultiReader federation: two independently built sub-indexes must
    # score exactly like one union index — the search_term oracle verbatim
    sql["multireader_search"] = _bm25_sql(term_terms)
    # repartitioned index: the live doc set (hence every statistic) is
    # unchanged by the re-shard — the search_term oracle verbatim again
    sql["repartition_search"] = _bm25_sql(term_terms)
    # addIndexes: the merged index IS the union corpus — same oracle
    sql["merge_search"] = _bm25_sql(term_terms)
    # block join, ScoreMode.None: parents (one synthetic doc per source)
    # of blocks with >= 1 child document matching the probe term — constant
    # score 1.0 (the parent filter never contributes to the score)
    sql["block_join"] = (
        _toks_cte()
        + " SELECT DISTINCT 'parent://' || d.source AS url, "
        "CAST(1.0 AS DOUBLE) AS score "
        "FROM toks t JOIN documents d ON t.doc_id = d.doc_id "
        f"WHERE t.term = '{term_terms[0]}' ORDER BY url"
    )
    sql["search_or"] = _bm25_sql(or_terms)
    sql["search_and"] = _bm25_sql(and_terms, conjunctive=True)
    sql["search_mm"] = _bm25_sql(or_terms, min_match=2)
    # pluggable similarities (IndexSearcher.setSimilarity) over the same
    # analyzed token stream: classic TF-IDF, LMDirichlet(mu=2000, per-term
    # clamp at 0 — docs whose every term clamps keep a 0.0 row), boolean
    # (coordination count).  One scaffold, three score expressions.
    _sim_values = ", ".join(f"('{t}')" for t in or_terms)

    def _sim_sql(score_expr: str, extra_ctes: str = "") -> str:
        return f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n FROM docs),
qterms AS (SELECT * FROM (VALUES {_sim_values}) q(term)),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE term IN (SELECT term FROM qterms) GROUP BY term){extra_ctes}
SELECT tf.doc_id AS doc_id, round({score_expr}, 4) AS score
FROM tf
JOIN df USING (term)
JOIN docs ON docs.doc_id = tf.doc_id
CROSS JOIN stats s
GROUP BY tf.doc_id
ORDER BY doc_id
"""

    sql["search_classic"] = _sim_sql(
        "sum(sqrt(tf.tf) * pow(ln((s.n + 1.0) / (df.df + 1.0)) + 1.0, 2)"
        " / sqrt(docs.dl))"
    )
    # CAST: DuckDB sums of the 1.0 literal are DECIMAL, the engine emits
    # float64
    sql["search_boolean_sim"] = _sim_sql("CAST(count(*) AS DOUBLE)")
    sql["search_lmdirichlet"] = _sim_sql(
        "sum(greatest(0.0,"
        " ln(1.0 + tf.tf / (2000.0 * (ttf.ttf * 1.0 / tot.sumdl)))"
        " + ln(2000.0 / (docs.dl + 2000.0))))",
        extra_ctes=(
            ",\nttf AS (SELECT term, count(*) AS ttf FROM toks GROUP BY term)"
            ",\ntot AS (SELECT count(*) AS sumdl FROM toks)"
        ),
    ).replace(
        "FROM tf\nJOIN df USING (term)",
        "FROM tf\nJOIN df USING (term)\nJOIN ttf ON ttf.term = tf.term\n"
        "CROSS JOIN tot",
    )
    sql["search_jelinekmercer"] = _sim_sql(
        "sum(ln(1.0 + (0.9 * tf.tf / docs.dl)"
        " / (0.1 * (ttf.ttf * 1.0 / tot.sumdl))))",
        extra_ctes=(
            ",\nttf AS (SELECT term, count(*) AS ttf FROM toks GROUP BY term)"
            ",\ntot AS (SELECT count(*) AS sumdl FROM toks)"
        ),
    ).replace(
        "FROM tf\nJOIN df USING (term)",
        "FROM tf\nJOIN df USING (term)\nJOIN ttf ON ttf.term = tf.term\n"
        "CROSS JOIN tot",
    )
    # DFR I(n)L2: tfn/(1+tfn) · log2((N+1)/(df+0.5)), tfn = tf·log2(1+avgdl/dl)
    sql["search_dfr"] = _sim_sql(
        "sum((tf.tf * ln(1.0 + av.avgdl / docs.dl) / ln(2.0))"
        " / (1.0 + tf.tf * ln(1.0 + av.avgdl / docs.dl) / ln(2.0))"
        " * (ln((s.n + 1.0) / (df.df + 0.5)) / ln(2.0)))",
        extra_ctes=(
            ",\nav AS (SELECT sum(dl) * 1.0 / count(*) AS avgdl FROM docs)"
        ),
    ).replace("CROSS JOIN stats s", "CROSS JOIN stats s\nCROSS JOIN av")

    # deep pagination: hits with round-4 score <= the k-th largest round-4
    # score, k = max(1, n//3) — the SQL mirror of the engine's strictly-
    # after-anchor predicate at anchor = round4@k + 0.00005 (see the entry
    # docstring for why the two predicates select the same set)
    sql["search_after"] = f"""
WITH b AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms)})),
a AS (SELECT score FROM (
        SELECT score, row_number() OVER (ORDER BY score DESC) AS rn,
               count(*) OVER () AS n FROM b)
      WHERE rn = greatest(n // 3, 1))
SELECT b.doc_id AS doc_id, b.score AS score FROM b, a
WHERE b.score <= a.score ORDER BY doc_id
"""
    # two-pass rescore: first-pass BM25 (full match set, unrounded) plus
    # 0.5 × the rescore query's BM25 where it matches — round-4 only on
    # the combined value, mirroring the engine's combine-then-emit order
    rescore_terms = analyze(_RESCORE_Q)
    rescore_inlist = ', '.join(f"'{t}'" for t in rescore_terms)
    sql["search_rescore"] = f"""
WITH s1 AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms, round_to=None)})),
s2 AS (SELECT doc_id, score FROM ({_bm25_sql(rescore_terms, round_to=None)}))
SELECT s1.doc_id AS doc_id,
       round(s1.score + 0.5 * coalesce(s2.score, 0.0), 4) AS score
FROM s1 LEFT JOIN s2 USING (doc_id) ORDER BY doc_id
"""
    # filtered search: BM25 of the OR query, match set intersected with
    # the filter query's boolean matches (scores untouched by the filter)
    sql["search_filtered"] = f"""
WITH s1 AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms, round_to=None)})),
f AS (SELECT DISTINCT doc_id FROM ({_toks_cte()} SELECT * FROM toks)
      WHERE term IN ({rescore_inlist}))
SELECT s1.doc_id AS doc_id, round(s1.score, 4) AS score
FROM s1 JOIN f USING (doc_id) ORDER BY doc_id
"""
    # query-time join (ScoreMode.Max): per joined lang the max unrounded
    # BM25 of the AND query's matching docs, propagated to every doc of
    # that lang — max is order-free, so round-4 lands identically
    sql["search_join"] = f"""
WITH s1 AS (SELECT doc_id, score
            FROM ({_bm25_sql(and_terms, conjunctive=True, round_to=None)})),
v AS (SELECT lower(d.lang) AS val, max(s1.score) AS vscore
      FROM s1 JOIN documents d USING (doc_id) GROUP BY 1)
SELECT d.doc_id AS doc_id, round(v.vscore, 4) AS score
FROM documents d JOIN v ON lower(d.lang) = v.val
ORDER BY doc_id
"""
    # naive-Bayes classification: ln prior + per-occurrence smoothed
    # likelihoods, all counts integer-exact on both sides, round-4 on the
    # final score only (the BM25-entry convention for ln sums)
    probe_vals = ", ".join(
        f"({i}, '{w}')"
        for i, p in enumerate(_CLS_PROBES)
        for w in analyze(p)
    )
    sql["classify_nb"] = f"""
{_toks_cte()},
probe(pid, term) AS (SELECT * FROM (VALUES {probe_vals})),
cls AS (SELECT doc_id, lower(lang) AS c FROM documents),
nc AS (SELECT c, count(*) AS n FROM cls GROUP BY c),
ntot AS (SELECT sum(n) AS n FROM nc),
v AS (SELECT count(DISTINCT term) AS v FROM toks),
dterm AS (SELECT DISTINCT pid, term FROM probe),
dfx AS (SELECT p.pid, p.term, cl.c, count(DISTINCT t.doc_id) AS df
        FROM dterm p JOIN toks t ON t.term = p.term
        JOIN cls cl ON cl.doc_id = t.doc_id
        GROUP BY 1, 2, 3),
occ AS (SELECT pr.pid, pr.term, nc.c, nc.n, coalesce(dfx.df, 0) AS df
        FROM probe pr CROSS JOIN nc
        LEFT JOIN dfx ON dfx.pid = pr.pid AND dfx.term = pr.term
                     AND dfx.c = nc.c),
s AS (SELECT o.pid, o.c, o.n,
             sum(ln((o.df + 1.0) / (o.n + v.v))) AS like_sum
      FROM occ o CROSS JOIN v GROUP BY 1, 2, 3)
SELECT s.pid AS probe_id, s.c AS class,
       round(ln(s.n * 1.0 / ntot.n) + s.like_sum, 4) AS score
FROM s CROSS JOIN ntot ORDER BY probe_id, class
"""

    # DrillSideways: per dim the facet counts over (match set ∧ every
    # OTHER dim's filter) — this dim's own filter removed
    sql["drill_sideways"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{_TERM_Q}'),
lv AS (SELECT doc_id, lower(lang) AS lang_v, lower(source) AS src_v
       FROM documents),
side AS (
  SELECT 'lang' AS dim, lv.lang_v AS value, count(*) AS c
  FROM m JOIN lv USING (doc_id)
  WHERE lv.src_v IN ('src3', 'src5') GROUP BY 2
  UNION ALL
  SELECT 'source' AS dim, lv.src_v AS value, count(*) AS c
  FROM m JOIN lv USING (doc_id)
  WHERE lv.lang_v = 'de' GROUP BY 2)
SELECT dim, value, CAST(c AS BIGINT) AS count FROM side ORDER BY dim, value
"""
    # highest-df terms: distinct-doc term counts, (df desc, term asc) top-25
    sql["top_terms"] = f"""
{_toks_cte()},
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df FROM df
ORDER BY df DESC, term ASC LIMIT 25
"""
    # numeric range faceting: analyzed-doc_len buckets over the 'spark'
    # match set (ranges overlap — each counted independently)
    sql["facet_ranges"] = f"""
{_toks_cte()},
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
v AS (SELECT dl.dl FROM (SELECT DISTINCT doc_id FROM toks
                         WHERE term = '{_TERM_Q}') m JOIN dl USING (doc_id))
SELECT * FROM (
  SELECT 'short' AS label, (SELECT count(*) FROM v WHERE dl < 120) AS count
  UNION ALL
  SELECT 'mid', (SELECT count(*) FROM v WHERE dl >= 120 AND dl < 300)
  UNION ALL
  SELECT 'long', (SELECT count(*) FROM v WHERE dl >= 300)
  UNION ALL
  SELECT 'all', (SELECT count(*) FROM v)
)
"""
    # function-scored search: UNROUNDED BM25 × the identical float64 recency
    # weight, rounded once on the final value (the engine's rounding order)
    sql["search_function"] = f"""
WITH b AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms, round_to=None)}))
SELECT doc_id,
       round(score * ({float(_FN_SCALE_US)} /
             ({float(_FN_SCALE_US)} +
              greatest({_FN_NOW_US} - (doc_id + {_PAGES_EPOCH_US}), 0))),
             4) AS score
FROM b ORDER BY doc_id
"""
    # surround language: OR of ordered (3w -> slop 2) and unordered
    # (2n -> slop 1) span pseudo-terms — raw span scores summed, round-4
    # on the final value only
    sql["search_surround"] = f"""
WITH s1 AS (SELECT doc_id, score FROM (
  {_span_near_ordered_sql("spark", "merge", 2, round_to=None)})),
s2 AS (SELECT doc_id, score FROM (
  {_span_near_unordered_sql("window", "stream", 1, round_to=None)}))
SELECT coalesce(s1.doc_id, s2.doc_id) AS doc_id,
       round(coalesce(s1.score, 0.0) + coalesce(s2.score, 0.0), 4) AS score
FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id ORDER BY doc_id
"""
    # proximity-conditioned facets: source counts over the near matches
    sql["facets_surround"] = f"""
WITH tl AS (SELECT doc_id,
       {_SQL_POSITIONED_TOKS.format(stop=_SQL_STOP_LIST_LITERAL)} AS toks
       FROM documents),
m AS (SELECT doc_id FROM tl
      WHERE len(list_filter(
            list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark'),
            pa -> coalesce(list_min(list_transform(
                  list_filter(range(1, len(toks)+1),
                              j -> toks[j] = 'merge' AND j > pa),
                  pb -> pb - pa)), 99) <= 3)) > 0)
SELECT d.source AS value, CAST(count(*) AS BIGINT) AS count
FROM m JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY count DESC, value ASC
"""
    # score-free surround count: ordered-near existence minus 'window'
    sql["count_surround"] = f"""
WITH tl AS (SELECT doc_id,
       {_SQL_POSITIONED_TOKS.format(stop=_SQL_STOP_LIST_LITERAL)} AS toks
       FROM documents),
m AS (SELECT doc_id FROM tl
      WHERE len(list_filter(
            list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark'),
            pa -> coalesce(list_min(list_transform(
                  list_filter(range(1, len(toks)+1),
                              j -> toks[j] = 'merge' AND j > pa),
                  pb -> pb - pa)), 99) <= 3)) > 0),
w AS (SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(toks) AS term FROM tl) WHERE term = 'window')
SELECT CAST(count(*) AS BIGINT) AS n
FROM m WHERE doc_id NOT IN (SELECT doc_id FROM w)
"""
    # diversified top-k: rank-within-key <= 3 under (score desc, doc_id)
    sql["search_diversified"] = f"""
WITH b AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms, round_to=None)})),
j AS (SELECT b.doc_id, b.score, d.source AS key
      FROM b JOIN documents d USING (doc_id)),
r AS (SELECT doc_id, score, key,
             row_number() OVER (PARTITION BY key
                                ORDER BY score DESC, doc_id ASC) AS kr
      FROM j)
SELECT doc_id, round(score, 4) AS score, key
FROM r WHERE kr <= 3 ORDER BY doc_id
"""
    # FunctionRangeQuery: the expr oracle's RAW value filtered to the
    # range (the engine filters on full precision, rounds after)
    sql["search_expr_range"] = f"""
WITH e AS (SELECT b.doc_id AS doc_id,
       b.score * 50.0 / (50.0 + dl.dl) + sqrt(dl.dl) * 0.001 AS v
FROM (SELECT doc_id, score FROM ({_bm25_sql(or_terms, round_to=None)})) b
JOIN (SELECT doc_id, count(*) AS dl FROM (
        SELECT doc_id, term FROM ({_TOKS.format(col="text")}) raw2
        WHERE term <> '' AND length(term) <= 255
          AND term NOT IN {SQL_STOPWORD_LIST}) t2
      GROUP BY doc_id) dl USING (doc_id))
SELECT doc_id, round(v, 4) AS score FROM e
WHERE v >= 0.25 AND v <= 0.6 ORDER BY doc_id
"""
    # CommonTermsQuery: full-OR BM25 restricted to docs matching >= 1
    # low-df term; classification df <= 0.78 * n is the same float64
    # compare on both sides
    sql["search_common"] = f"""
WITH b AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms)})),
raw2 AS ({_TOKS.format(col="text")}),
t2 AS (SELECT doc_id, term FROM raw2 WHERE term <> ''
       AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
n AS (SELECT count(*) AS n FROM documents),
df2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM t2
        WHERE term IN ({or_inlist}) GROUP BY term),
lows AS (SELECT term FROM df2 CROSS JOIN n WHERE df <= 0.78 * n.n),
low_docs AS (SELECT DISTINCT doc_id FROM t2
             WHERE term IN (SELECT term FROM lows))
SELECT b.doc_id AS doc_id, b.score AS score
FROM b JOIN low_docs USING (doc_id) ORDER BY doc_id
"""
    # BoostingQuery: positive BM25, 0.25x where the negative matches
    sql["search_boosting"] = f"""
WITH b AS (SELECT doc_id, score
           FROM ({_bm25_sql(["spark", "merge"], round_to=None)})),
raw2 AS ({_TOKS.format(col="text")}),
t2 AS (SELECT doc_id, term FROM raw2 WHERE term <> ''
       AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
neg AS (SELECT DISTINCT doc_id FROM t2 WHERE term = 'window')
SELECT b.doc_id AS doc_id,
       round(CASE WHEN neg.doc_id IS NOT NULL THEN b.score * 0.25
             ELSE b.score END, 4) AS score
FROM b LEFT JOIN neg USING (doc_id) ORDER BY doc_id
"""
    # expressions module: the same float64 tree over dl (analyzed |D|)
    sql["search_expr"] = f"""
WITH b AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms, round_to=None)})),
raw2 AS ({_TOKS.format(col="text")}),
t2 AS (SELECT doc_id, term FROM raw2 WHERE term <> ''
       AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY doc_id)
SELECT b.doc_id AS doc_id,
       round(b.score * 50.0 / (50.0 + dl.dl) + sqrt(dl.dl) * 0.001, 4) AS score
FROM b JOIN dl USING (doc_id) ORDER BY doc_id
"""
    # prefix autocompletion: live-vocab terms LIKE 's%', df = distinct docs,
    # rank (df desc, term asc) top 10
    sql["autocomplete_infix"] = f"""
{_toks_cte()},
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term LIKE '%ar%' GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df FROM df
ORDER BY df DESC, term ASC LIMIT 10
"""
    sql["autocomplete"] = f"""
{_toks_cte()},
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term LIKE 's%' GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df FROM df
ORDER BY df DESC, term ASC LIMIT 10
"""

    def _with_qid(qid: int, inner: str) -> str:
        return f"SELECT CAST({qid} AS BIGINT) AS qid, doc_id, score FROM ({inner})"

    sql["batch_search"] = (
        _with_qid(0, _bm25_sql(term_terms))
        + " UNION ALL "
        + _with_qid(1, _bm25_sql(and_terms, conjunctive=True))
        + " UNION ALL "
        + _with_qid(2, f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(lang), '[^a-z0-9]+')) AS term FROM documents),
toks AS (SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 255
         AND term NOT IN {SQL_STOPWORD_LIST}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
df AS (SELECT term, count(*) AS df FROM tf WHERE term = 'de' GROUP BY term)
SELECT tf.doc_id AS doc_id,
       round(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl)), 4) AS score
FROM tf JOIN df USING (term) JOIN docs ON docs.doc_id = tf.doc_id CROSS JOIN stats s
WHERE tf.term = 'de'
""")
        + " ORDER BY qid, doc_id"
    )

    # numeric facet aggregation: doc_len (analyzed token count) stats per
    # lang over the 'spark' boolean match set — integer-exact on both sides
    sql["facets_stats"] = f"""
{_toks_cte()},
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{term_terms[0]}'),
j AS (SELECT d.lang AS value, coalesce(dl.dl, 0) AS v
      FROM m JOIN documents d USING (doc_id) LEFT JOIN dl USING (doc_id))
SELECT value, CAST(count(*) AS BIGINT) AS count, CAST(min(v) AS BIGINT) AS vmin,
       CAST(max(v) AS BIGINT) AS vmax, CAST(sum(v) AS BIGINT) AS vsum
FROM j GROUP BY value ORDER BY value
"""

    # grouped top-k: ranks from ROUND-4 scores (the hybrid contract) —
    # within group (score desc, doc_id asc) <= 3, groups by head doc
    sql["search_grouped"] = f"""
WITH scored AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms)})),
g AS (SELECT s.doc_id, s.score, d.source AS grp
      FROM scored s JOIN documents d USING (doc_id)),
dr AS (SELECT grp, doc_id, score,
              row_number() OVER (PARTITION BY grp ORDER BY score DESC, doc_id ASC) AS doc_rank
       FROM g QUALIFY doc_rank <= 3),
heads AS (SELECT grp, score AS head_score, doc_id AS head_id FROM dr WHERE doc_rank = 1),
gr AS (SELECT grp, row_number() OVER (ORDER BY head_score DESC, head_id ASC) AS group_rank
       FROM heads)
SELECT dr.grp AS "group", CAST(gr.group_rank AS BIGINT) AS group_rank,
       CAST(dr.doc_rank AS BIGINT) AS doc_rank, dr.doc_id, dr.score
FROM dr JOIN gr USING (grp)
ORDER BY group_rank, doc_rank
"""

    # dismax (DisjunctionMaxQuery): per term and doc, the max of the
    # weighted per-field BM25 legs + tie·(sum − max); legs use each field's
    # own tf/dl/avgdl/df exactly like the single-field oracles
    dismax_terms = analyze(_DISMAX_Q)
    dm_values = ", ".join(f"('{t}')" for t in dismax_terms)
    sql["search_dismax"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
qt(term) AS (SELECT * FROM (VALUES {dm_values})),
tdf AS (SELECT term, count(*) AS df FROM tf
        WHERE term IN (SELECT term FROM qt) GROUP BY term),
tleg AS (SELECT tf.doc_id, tf.term,
                1.0 * ln(1.0 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
                * (tf.tf * (1.2 + 1.0))
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl)) AS sc
         FROM tf JOIN tdf USING (term)
         JOIN docs ON docs.doc_id = tf.doc_id CROSS JOIN stats s),
lraw AS (SELECT doc_id, unnest(string_split_regex(lower(lang), '[^a-z0-9]+')) AS term FROM documents),
ltoks AS (SELECT doc_id, term FROM lraw WHERE term <> '' AND length(term) <= 255
          AND term NOT IN {SQL_STOPWORD_LIST}),
ltf AS (SELECT doc_id, term, count(*) AS tf FROM ltoks GROUP BY doc_id, term),
ldl AS (SELECT doc_id, count(*) AS dl FROM ltoks GROUP BY doc_id),
ldocs AS (SELECT d.doc_id, coalesce(ldl.dl, 0) AS dl
          FROM documents d LEFT JOIN ldl USING (doc_id)),
lstats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM ldocs),
ldf AS (SELECT term, count(*) AS df FROM ltf
        WHERE term IN (SELECT term FROM qt) GROUP BY term),
lleg AS (SELECT ltf.doc_id, ltf.term,
                2.0 * ln(1.0 + (s.n - ldf.df + 0.5) / (ldf.df + 0.5))
                * (ltf.tf * (1.2 + 1.0))
                / (ltf.tf + 1.2 * (1.0 - 0.75 + 0.75 * ldocs.dl / s.avgdl)) AS sc
         FROM ltf JOIN ldf USING (term)
         JOIN ldocs ON ldocs.doc_id = ltf.doc_id CROSS JOIN lstats s),
cand AS (SELECT DISTINCT doc_id, term FROM
         (SELECT doc_id, term FROM tleg UNION ALL SELECT doc_id, term FROM lleg)),
dm AS (SELECT c.doc_id,
              greatest(coalesce(t.sc, 0), coalesce(l.sc, 0))
              + 0.3 * (coalesce(t.sc, 0) + coalesce(l.sc, 0)
                       - greatest(coalesce(t.sc, 0), coalesce(l.sc, 0))) AS sc
       FROM cand c LEFT JOIN tleg t USING (doc_id, term)
       LEFT JOIN lleg l USING (doc_id, term))
SELECT doc_id, round(sum(sc), 4) AS score FROM dm GROUP BY doc_id
ORDER BY doc_id
"""

    # hybrid RRF: BM25 leg (ranks on the round-4 score, the _bm25_sql
    # contract) + cosine leg vs vec_id 0 (ranks on the round-5 cos, the
    # ann_topk contract); rrf = Σ 1/(60 + rank), absent legs rank 0
    sql["hybrid_search"] = f"""
WITH lex AS (SELECT doc_id, score FROM ({_bm25_sql(or_terms)})),
lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
         FROM lex QUALIFY r <= 20),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
sem AS (SELECT e.vec_id AS doc_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.v), 5) AS cos
        FROM embeddings e CROSS JOIN qv),
semr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r
         FROM sem QUALIFY r <= 20),
cand AS (SELECT doc_id FROM lexr UNION SELECT doc_id FROM semr)
SELECT c.doc_id,
       round(coalesce(1.0/(60 + l.r), 0) + coalesce(1.0/(60 + s.r), 0), 6) AS rrf,
       CAST(coalesce(l.r, 0) AS BIGINT) AS lex_rank,
       CAST(coalesce(s.r, 0) AS BIGINT) AS sem_rank
FROM cand c LEFT JOIN lexr l USING (doc_id) LEFT JOIN semr s USING (doc_id)
ORDER BY rrf DESC, doc_id ASC LIMIT 10
"""

    # field-scoped BM25 over the single-token lang column
    sql["search_field"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(lang), '[^a-z0-9]+')) AS term FROM documents),
toks AS (SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 255
         AND term NOT IN {SQL_STOPWORD_LIST}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
df AS (SELECT term, count(*) AS df FROM tf WHERE term = 'de' GROUP BY term)
SELECT tf.doc_id AS doc_id,
       round(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl)), 4) AS score
FROM tf JOIN df USING (term) JOIN docs ON docs.doc_id = tf.doc_id CROSS JOIN stats s
WHERE tf.term = 'de'
ORDER BY doc_id
"""

    # Q8 phrase: BM25 on slop-0 phrase frequency, summed per-term idf
    sql["search_phrase"] = _phrase_bm25_sql(["spark", "merge"], [0, 1])
    # span family: positioned-token oracles under the SpanClause contract
    sql["span_near"] = _span_near_ordered_sql("spark", "merge", _SPAN_SLOP)
    sql["span_near_unordered"] = _span_near_unordered_sql(
        "merge", "spark", _SPAN_SLOP
    )
    sql["span_first"] = _span_first_sql("spark", _SPAN_FIRST_END)
    sql["span_not"] = _span_not_sql(
        "spark", "merge", _SPAN_NOT_PRE, _SPAN_NOT_POST
    )

    # Q8 phrase with a query-side stop word: offsets (0, 2) — the surviving
    # terms must be exactly 2 pre-filter positions apart in the document
    sql["search_phrase_gap"] = _phrase_bm25_sql(["spark", "merge"], [0, 2])

    # Q14 proximity: min-move distance per first-term anchor, Σ 1/(1+d)
    sql["search_sloppy"] = _sloppy_bm25_sql("spark", "merge", 2)

    # highlighting: best 8-token window per OR hit (distinct scored terms
    # maximized, earliest tiebreak, 1-based start, analyzed-token snippet)
    _snip_terms = ", ".join(f"'{t}'" for t in analyze(_OR_Q))
    sql["search_snippets"] = f"""
WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> t <> '' AND length(t) <= 255
            AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, t)) AS toks
            FROM documents),
sc AS (SELECT * FROM ({_bm25_sql(analyze(_OR_Q))})),
win AS (SELECT tl.doc_id, least(8, len(toks)) AS w, toks
        FROM tl WHERE tl.doc_id IN (SELECT doc_id FROM sc)),
best AS (SELECT doc_id, w, toks,
  list_transform(range(1, len(toks) - w + 2), i ->
    len(list_distinct(list_filter(list_slice(toks, i, i + w - 1),
        t -> t IN ({_snip_terms}))))) AS cnts
  FROM win)
SELECT b.doc_id AS doc_id, sc.score AS score,
       CAST(list_position(b.cnts, list_max(b.cnts)) AS BIGINT) AS start,
       CAST(list_max(b.cnts) AS BIGINT) AS n_terms,
       array_to_string(list_slice(b.toks,
           list_position(b.cnts, list_max(b.cnts)),
           list_position(b.cnts, list_max(b.cnts)) + b.w - 1), ' ') AS snippet
FROM best b JOIN sc USING (doc_id) ORDER BY doc_id
"""

    # Q13 groups: (spark merge) AND window — match = window ∧ (spark ∨
    # merge); score = Σ bm25 over every matching clause
    sql["search_group"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE term IN ('spark', 'merge', 'window') GROUP BY term),
m AS (SELECT doc_id FROM toks WHERE term = 'window'
      INTERSECT
      SELECT doc_id FROM toks WHERE term IN ('spark', 'merge'))
SELECT tf.doc_id AS doc_id,
       round(sum(
         ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl))
       ), 4) AS score
FROM tf
JOIN df USING (term)
JOIN docs ON docs.doc_id = tf.doc_id
CROSS JOIN stats s
WHERE tf.doc_id IN (SELECT doc_id FROM m)
  AND tf.term IN ('spark', 'merge', 'window')
GROUP BY tf.doc_id
ORDER BY doc_id
"""

    # Q12 boost: per-clause score multiplier (^n) — spark doubled
    sql["search_boost"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
qt(term, boost) AS (VALUES ('spark', 2.0), ('merge', 1.0)),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE term IN (SELECT term FROM qt) GROUP BY term)
SELECT tf.doc_id AS doc_id,
       round(sum(
         (ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
          * (tf.tf * (1.2 + 1.0))
          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl))) * qt.boost
       ), 4) AS score
FROM tf
JOIN df USING (term)
JOIN qt USING (term)
JOIN docs ON docs.doc_id = tf.doc_id
CROSS JOIN stats s
GROUP BY tf.doc_id
ORDER BY doc_id
"""

    # SynonymQuery: (spark, merge) as one pseudo-term — tf summed over
    # members, idf from the MAX member df
    sql["search_synonyms"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
gdf AS (SELECT max(df) AS df FROM
        (SELECT term, count(*) AS df FROM tf
         WHERE term IN ('spark', 'merge') GROUP BY term)),
gtf AS (SELECT doc_id, sum(tf) AS tf FROM tf
        WHERE term IN ('spark', 'merge') GROUP BY doc_id)
SELECT gtf.doc_id AS doc_id,
       round(ln(1.0 + (s.n - g.df + 0.5) / (g.df + 0.5))
             * (gtf.tf * (1.2 + 1.0))
             / (gtf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl)), 4) AS score
FROM gtf JOIN docs USING (doc_id) CROSS JOIN stats s CROSS JOIN gdf g
ORDER BY doc_id
"""

    # Q11 MUST_NOT: BM25 on the positive term, prohibited docs excluded
    sql["search_not"] = f"""
SELECT doc_id, score FROM ({_bm25_sql(['spark'])})
WHERE doc_id NOT IN (
  {_toks_cte()}
  SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')
ORDER BY doc_id
"""

    # Q9/Q10 dictionary-expanded constant-score clauses: a doc matches iff
    # ANY analyzed token matches the pattern — score 1.0 (Lucene 5.x
    # MultiTermQuery CONSTANT_SCORE rewrite)
    sql["search_prefix"] = f"""
{_toks_cte()}
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE term LIKE 's%' ORDER BY doc_id
"""
    sql["search_wildcard"] = f"""
{_toks_cte()}
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE term LIKE 's_a%' ORDER BY doc_id
"""
    sql["search_fuzzy"] = f"""
{_toks_cte()}
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE damerau_levenshtein(term, 'spakr') <= 1 ORDER BY doc_id
"""
    sql["search_regexp"] = f"""
{_toks_cte()}
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE regexp_full_match(term, '{_REGEXP_RE2}') ORDER BY doc_id
"""
    # MatchAllDocsQuery composed with MUST_NOT ('-spark *:*'): every doc
    # whose analyzed token stream does NOT contain the term, score 1.0
    sql["search_match_all"] = f"""
{_toks_cte()}
SELECT d.doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'spark')
ORDER BY d.doc_id
"""

    # faceting: lang-token counts over the OR query's match set.  The facet
    # value stream mirrors the index's ANALYZED lang field (lowercase split
    # + stopword drop), and count(DISTINCT doc_id) mirrors postings
    # membership (a doc counts once per distinct facet value).
    sql["search_facets"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
lraw AS (SELECT doc_id, unnest(string_split_regex(lower(lang), '[^a-z0-9]+')) AS term FROM documents),
ltoks AS (SELECT doc_id, term FROM lraw WHERE term <> '' AND length(term) <= 255
          AND term NOT IN {SQL_STOPWORD_LIST})
SELECT lt.term AS value, count(DISTINCT lt.doc_id) AS "count"
FROM ltoks lt JOIN m USING (doc_id)
GROUP BY lt.term ORDER BY "count" DESC, value ASC
"""

    # hierarchical facets: lang→source rollup over the OR query's match
    # set.  Both level streams mirror the index's ANALYZED fields (lowercase
    # split + stopword drop); count(DISTINCT doc_id) mirrors postings
    # membership (a doc counts once per distinct path); '/' sorts below
    # every token char, so ORDER BY the joined path equals the engine's
    # componentwise order.
    sql["facets_taxonomy"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
lraw AS (SELECT doc_id, unnest(string_split_regex(lower(lang), '[^a-z0-9]+')) AS term FROM documents),
ltoks AS (SELECT DISTINCT doc_id, term FROM lraw WHERE term <> '' AND length(term) <= 255
          AND term NOT IN {SQL_STOPWORD_LIST}),
sraw AS (SELECT doc_id, unnest(string_split_regex(lower(source), '[^a-z0-9]+')) AS term FROM documents),
stoks AS (SELECT DISTINCT doc_id, term FROM sraw WHERE term <> '' AND length(term) <= 255
          AND term NOT IN {SQL_STOPWORD_LIST}),
l1 AS (SELECT lt.term AS path, count(DISTINCT lt.doc_id) AS "count"
       FROM ltoks lt JOIN m USING (doc_id) GROUP BY lt.term),
l2 AS (SELECT lt.term || '/' || st.term AS path, count(DISTINCT m.doc_id) AS "count"
       FROM m JOIN ltoks lt USING (doc_id) JOIN stoks st USING (doc_id)
       GROUP BY lt.term, st.term)
SELECT path, "count" FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
ORDER BY path
"""

    # dataset mixing: quotas from exact per-source counts (LEAST caps at the
    # count), selection = per-source smallest (sha256(text), doc_id)
    mix_values = ", ".join(f"('{s}', {w})" for s, w in _MIX_WEIGHTS.items())
    sql["dataset_mix"] = f"""
WITH w(source, w) AS (VALUES {mix_values}),
tot AS (SELECT sum(w) AS sw FROM w),
counts AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
quota AS (SELECT c.source, LEAST(c.c, CAST(floor({_MIX_TOTAL} * w.w / t.sw) AS BIGINT)) AS q
          FROM counts c JOIN w USING (source) CROSS JOIN tot t),
ranked AS (SELECT doc_id, source, sha256(coalesce(text, '')) AS content_sha,
           row_number() OVER (PARTITION BY source
                              ORDER BY sha256(coalesce(text, '')), doc_id) AS rn
           FROM documents)
SELECT r.doc_id AS doc_id, r.source AS source, r.content_sha AS content_sha
FROM ranked r JOIN quota qt ON qt.source = r.source
WHERE r.rn <= qt.q
ORDER BY doc_id
"""

    # winnowing (MOSS): k-token window hashes (16-hex sha256 prefix —
    # string comparison == numeric comparison at fixed width), rightmost
    # minimal hash per w-window; short docs (< w windows) get one
    # whole-stream window
    sql["winnow_fingerprints"] = f"""
WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> t <> '' AND length(t) <= 255
            AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, t)) AS toks
            FROM documents),
grams AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
          substr(sha256(array_to_string(list_slice(toks, i + 1, i + 5), ' ')), 1, 16) AS h
          FROM tl, unnest(range(0, len(toks) - 5 + 1)) AS t(i)
          WHERE len(toks) >= 5),
ng AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
starts AS (SELECT doc_id, CAST(unnest(range(0, greatest(n - 4 + 1, 1))) AS BIGINT) AS s FROM ng),
win AS (SELECT s.doc_id, s.s, g.i, g.h,
        row_number() OVER (PARTITION BY s.doc_id, s.s ORDER BY g.h ASC, g.i DESC) AS rk
        FROM starts s JOIN grams g ON g.doc_id = s.doc_id
             AND g.i >= s.s AND g.i < s.s + 4)
SELECT DISTINCT doc_id, i AS pos, h AS fp FROM win WHERE rk = 1
ORDER BY doc_id, pos
"""

    # DSIR importance weights: hashed-bigram (4-hex sha256 bucket) log
    # likelihood ratio of target (doc_id % 97 == 0) vs raw, add-1 smoothed
    # over 65536 possible buckets, micro-nat-quantized integer sums
    sql["dsir_weights"] = f"""
WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> t <> '' AND length(t) <= 255
            AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, t)) AS toks
            FROM documents),
big AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
        FROM tl, unnest(range(1, len(toks))) AS t(i) WHERE len(toks) >= 2),
bb AS (SELECT doc_id, substr(sha256(g), 1, 4) AS b FROM big),
rawc AS (SELECT b, count(*) AS c FROM bb GROUP BY b),
rtot AS (SELECT count(*) AS n FROM bb),
tgtc AS (SELECT b, count(*) AS c FROM bb WHERE doc_id % 97 = 0 GROUP BY b),
ttot AS (SELECT count(*) AS n FROM bb WHERE doc_id % 97 = 0),
w AS (SELECT rawc.b,
      CAST(round((ln((coalesce(tgtc.c, 0) + 1.0) / (ttot.n + 65536.0))
                - ln((rawc.c + 1.0) / (rtot.n + 65536.0))) * 1e6) AS BIGINT) AS wq
      FROM rawc LEFT JOIN tgtc USING (b) CROSS JOIN rtot CROSS JOIN ttot),
per AS (SELECT bb.doc_id, count(*) AS nb, CAST(sum(w.wq) AS BIGINT) AS s
        FROM bb JOIN w USING (b) GROUP BY bb.doc_id)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(per.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(per.s, 0) AS BIGINT) AS logweight_micro
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id
"""

    # count-only query: boolean OR match total (no scoring)
    sql["search_count"] = f"""
{_toks_cte()}
SELECT count(DISTINCT doc_id) AS n_hits FROM toks WHERE term IN ({or_inlist})
"""

    # sort-by-field: OR match set ordered by warc_ts desc (the pages adapter
    # synthesizes warc_ts = 1_600_000_000_000_000 µs + doc_id,
    # sources/pages.py:27,46), doc_id-asc tiebreak
    sql["search_sorted"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
s AS (SELECT doc_id, CAST(1600000000000000 + doc_id AS BIGINT) AS ts_us FROM m)
SELECT doc_id, ts_us,
       CAST(row_number() OVER (ORDER BY ts_us DESC, doc_id ASC) AS BIGINT) AS rank
FROM s ORDER BY doc_id
"""

    # per-field index statistics: docs / distinct terms / distinct
    # (doc, term) postings per analyzed field, integer-exact
    sql["index_stats"] = f"""
{_toks_cte()},
lraw AS (SELECT doc_id, unnest(string_split_regex(lower(lang), '[^a-z0-9]+')) AS term FROM documents),
ltoks AS (SELECT doc_id, term FROM lraw WHERE term <> '' AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
sraw AS (SELECT doc_id, unnest(string_split_regex(lower(source), '[^a-z0-9]+')) AS term FROM documents),
stoks AS (SELECT doc_id, term FROM sraw WHERE term <> '' AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
n AS (SELECT count(*) AS docs FROM documents)
SELECT * FROM (
  SELECT 'text' AS field, n.docs AS docs,
         (SELECT count(DISTINCT term) FROM toks) AS vocab,
         (SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM toks)) AS postings
  FROM n
  UNION ALL
  SELECT 'lang', n.docs,
         (SELECT count(DISTINCT term) FROM ltoks),
         (SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM ltoks))
  FROM n
  UNION ALL
  SELECT 'source', n.docs,
         (SELECT count(DISTINCT term) FROM stoks),
         (SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM stoks))
  FROM n
) ORDER BY field
"""

    # multi-key field sort: (analyzed doc_len desc, ts asc) — ts unique in
    # this corpus, so the composite key is already a total order
    sql["search_sorted_multi"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
s AS (SELECT m.doc_id, coalesce(dl.dl, 0) AS dl,
             CAST(1600000000000000 + m.doc_id AS BIGINT) AS ts_us
      FROM m LEFT JOIN dl USING (doc_id))
SELECT doc_id, CAST(dl AS BIGINT) AS dl, ts_us,
       CAST(row_number() OVER (ORDER BY dl DESC, ts_us ASC) AS BIGINT) AS rank
FROM s ORDER BY doc_id
"""

    # STRING field sort: analyzed min term of the source field == the raw
    # source value (single lowercase tokens); lexicographic term order
    sql["search_sorted_str"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
s AS (SELECT m.doc_id, d.source,
             CAST(1600000000000000 + m.doc_id AS BIGINT) AS ts_us
      FROM m JOIN documents d USING (doc_id))
SELECT doc_id, source, ts_us,
       CAST(row_number() OVER (ORDER BY source ASC, ts_us DESC) AS BIGINT) AS rank
FROM s ORDER BY doc_id
"""

    # STRING-sort deep pagination: rows strictly after the global
    # (source asc, ts desc) rank-n//3 anchor, re-ranked within the page
    sql["search_sorted_str_after"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
s AS (SELECT m.doc_id, d.source,
             CAST(1600000000000000 + m.doc_id AS BIGINT) AS ts_us
      FROM m JOIN documents d USING (doc_id)),
r AS (SELECT *, row_number() OVER (ORDER BY source ASC, ts_us DESC) AS rn
      FROM s),
cnt AS (SELECT count(*) AS c FROM r),
k AS (SELECT greatest((SELECT c FROM cnt) // 3, 1) AS k)
SELECT doc_id, source, ts_us,
       CAST(rn - (SELECT k FROM k) AS BIGINT) AS rank
FROM r WHERE rn > (SELECT k FROM k) ORDER BY doc_id
"""

    # sorted deep pagination: anchor = ts at global recency rank n//3,
    # page = strictly-older rows (ts unique in this corpus), rank within
    # the page
    sql["search_sorted_after"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
s AS (SELECT doc_id, CAST(1600000000000000 + doc_id AS BIGINT) AS ts_us FROM m),
cnt AS (SELECT count(*) AS c FROM s),
a AS (SELECT ts_us FROM (
        SELECT ts_us, row_number() OVER (ORDER BY ts_us DESC, doc_id ASC) AS rn
        FROM s)
      WHERE rn = greatest((SELECT c FROM cnt) // 3, 1))
SELECT s.doc_id AS doc_id, s.ts_us AS ts_us,
       CAST(row_number() OVER (ORDER BY s.ts_us DESC, s.doc_id ASC) AS BIGINT) AS rank
FROM s, a WHERE s.ts_us < a.ts_us ORDER BY doc_id
"""

    # spell suggestion: vocab terms within DL<=2 of the probe, df-ranked
    sql["spell_suggest"] = f"""
{_toks_cte()},
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term,
       CAST(damerau_levenshtein(term, 'spakr') AS BIGINT) AS distance,
       CAST(df AS BIGINT) AS df
FROM dfs WHERE damerau_levenshtein(term, 'spakr') <= 2
ORDER BY distance ASC, df DESC, term ASC LIMIT 5
"""

    # date histogram over the OR match set (warc_ts = epoch + doc_id µs)
    sql["date_histogram"] = f"""
{_toks_cte()},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({or_inlist})),
b AS (SELECT CAST((1600000000000000 + doc_id) // 100 * 100 AS BIGINT)
      AS bucket_start_us FROM m)
SELECT bucket_start_us, count(*) AS "count"
FROM b GROUP BY bucket_start_us ORDER BY bucket_start_us
"""

    # term vector: doc _MLT_DOC's (term, tf, positions).  Detected tokens =
    # the NON-EMPTY [a-z0-9]+ runs of the lowercased text, position = 0-based
    # rank among them BEFORE the stop/length filter (a dropped token leaves a
    # positional hole — StopFilter enablePositionIncrements parity); a term's
    # positions are comma-joined ascending, mirroring the engine's column.
    sql["term_vector"] = f"""
WITH det AS (
  SELECT term, row_number() OVER (ORDER BY i) - 1 AS pos
  FROM (
    SELECT unnest(toks) AS term, unnest(range(1, len(toks) + 1)) AS i
    FROM (SELECT string_split_regex(lower(text), '[^a-z0-9]+') AS toks
          FROM documents WHERE doc_id = {_MLT_DOC})
  ) WHERE term <> ''
)
SELECT term, count(*) AS tf,
       string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
FROM det
WHERE length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}
GROUP BY term ORDER BY term
"""

    # MoreLikeThis: doc _MLT_DOC's terms weighted tf·idf (the engine's BM25
    # idf), top 10 (w desc, term asc — equal weights only arise from equal
    # (tf, df), so the tiebreak is engine-identical), then full-corpus BM25
    # over those terms with the source doc excluded.
    sql["more_like_this"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
src AS (SELECT term, tf FROM tf WHERE doc_id = {_MLT_DOC}),
dfw AS (SELECT term, count(*) AS df FROM tf
        WHERE term IN (SELECT term FROM src) GROUP BY term),
w AS (SELECT s.term, s.tf * ln(1.0 + (st.n - dfw.df + 0.5) / (dfw.df + 0.5)) AS w
      FROM src s JOIN dfw USING (term) CROSS JOIN stats st),
qterms AS (SELECT term FROM w ORDER BY w DESC, term ASC LIMIT 10),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE term IN (SELECT term FROM qterms) GROUP BY term)
SELECT tf.doc_id AS doc_id,
       round(sum(
         ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl))
       ), 4) AS score
FROM tf
JOIN df USING (term)
JOIN docs ON docs.doc_id = tf.doc_id
CROSS JOIN stats s
WHERE tf.doc_id <> {_MLT_DOC}
GROUP BY tf.doc_id
ORDER BY doc_id
"""

    # like(docId) form: indexed tfs == analyzed tfs for a live doc, so
    # the like-text oracle applies verbatim
    sql["mlt_by_doc"] = sql["more_like_this"]

    # KNN classification: the MLT match set's round-4 scores in integer
    # 1e-4 vote units, summed per lang — pure integer output
    sql["classify_knn"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
docs AS (SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
         FROM documents d LEFT JOIN dl USING (doc_id)),
stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM docs),
src AS (SELECT term, tf FROM tf WHERE doc_id = {_MLT_DOC}),
dfw AS (SELECT term, count(*) AS df FROM tf
        WHERE term IN (SELECT term FROM src) GROUP BY term),
w AS (SELECT s.term, s.tf * ln(1.0 + (st.n - dfw.df + 0.5) / (dfw.df + 0.5)) AS w
      FROM src s JOIN dfw USING (term) CROSS JOIN stats st),
qterms AS (SELECT term FROM w ORDER BY w DESC, term ASC LIMIT 10),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE term IN (SELECT term FROM qterms) GROUP BY term),
hits AS (SELECT tf.doc_id AS doc_id,
       CAST(floor(round(sum(
         ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * docs.dl / s.avgdl))
       ), 4) * 10000 + 0.5) AS BIGINT) AS vote
FROM tf
JOIN df USING (term)
JOIN docs ON docs.doc_id = tf.doc_id
CROSS JOIN stats s
WHERE tf.doc_id <> {_MLT_DOC}
GROUP BY tf.doc_id)
SELECT lower(d.lang) AS class,
       CAST(sum(h.vote) AS BIGINT) AS vote_units,
       CAST(count(*) AS BIGINT) AS hits
FROM hits h JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY class
"""

    # lexicographic term range on the source field — constant score 1.0
    sql["search_range"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(source), '[^a-z0-9]+')) AS term FROM documents),
toks AS (SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 255
         AND term NOT IN {SQL_STOPWORD_LIST})
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE term >= '{_RANGE_LO}' AND term <= '{_RANGE_HI}'
ORDER BY doc_id
"""

    # exclusive brackets {{a TO b}} (strict inequalities — QP grammar parity)
    sql["search_range_excl"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(source), '[^a-z0-9]+')) AS term FROM documents),
toks AS (SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 255
         AND term NOT IN {SQL_STOPWORD_LIST})
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE term > '{_RANGE_LO}' AND term < '{_RANGE_HI}'
ORDER BY doc_id
"""

    # open upper bound [a TO *] (no upper endpoint)
    sql["search_range_open"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(source), '[^a-z0-9]+')) AS term FROM documents),
toks AS (SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 255
         AND term NOT IN {SQL_STOPWORD_LIST})
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM toks
WHERE term >= '{_RANGE_HI}'
ORDER BY doc_id
"""

    sql["term_stats"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term ORDER BY term
"""

    sql["token_count"] = f"""
{_toks_cte()},
dl AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id)
SELECT d.doc_id, coalesce(dl.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN dl USING (doc_id) ORDER BY doc_id
"""

    sql["quality_score"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents),
ne AS (SELECT doc_id, term FROM raw WHERE term <> ''),
agg AS (SELECT doc_id, count(*) AS n_tokens_all,
               sum(CASE WHEN term IN {SQL_STOPWORD_LIST} THEN 1 ELSE 0 END) AS n_stop,
               sum(length(term)) AS sum_len
        FROM ne GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_tokens_all, 0) AS n_tokens_all,
       CAST(coalesce(a.n_stop, 0) AS BIGINT) AS n_stop,
       round(coalesce(a.n_stop, 0) * 1.0 / greatest(coalesce(a.n_tokens_all, 0), 1), 6) AS stop_ratio,
       round(coalesce(a.sum_len, 0) * 1.0 / greatest(coalesce(a.n_tokens_all, 0), 1), 6) AS avg_token_len
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
"""

    sql["fingerprint"] = f"""
SELECT doc_id,
       sha256(coalesce(array_to_string(
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '' AND length(x) <= 255
                          AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, x)),
         ' '), '')) AS fp_sha256
FROM documents ORDER BY doc_id
"""

    sql["jaccard_adjacent"] = f"""
{_toks_cte()},
s AS (SELECT DISTINCT doc_id, term FROM toks),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, count(*) AS c
          FROM s x JOIN s y ON y.doc_id = x.doc_id + 1 AND y.term = x.term
          GROUP BY x.doc_id)
SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
       round(coalesce(i.c, 0) * 1.0 / (sa.n + sb.n - coalesce(i.c, 0)), 6) AS jaccard
FROM sizes sa JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
LEFT JOIN inter i ON i.doc_a = sa.doc_id
ORDER BY doc_a
"""

    # connected components over the adjacent-jaccard >= 0.5 pair graph:
    # recursive-CTE transitive closure, cluster_id = min reachable doc_id
    sql["dedup_clusters"] = f"""
{_toks_cte().replace("WITH ", "WITH RECURSIVE ", 1)},
s AS (SELECT DISTINCT doc_id, term FROM toks),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, count(*) AS c
          FROM s x JOIN s y ON y.doc_id = x.doc_id + 1 AND y.term = x.term
          GROUP BY x.doc_id),
jac AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
        FROM sizes sa JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
        LEFT JOIN inter i ON i.doc_a = sa.doc_id
        WHERE round(coalesce(i.c, 0) * 1.0
                    / (sa.n + sb.n - coalesce(i.c, 0)), 6) >= 0.5),
e AS (SELECT doc_a AS a, doc_b AS b FROM jac
      UNION ALL SELECT doc_b, doc_a FROM jac),
nodes AS (SELECT DISTINCT a AS v FROM e),
reach AS (SELECT v, v AS r FROM nodes
          UNION
          SELECT e.b AS v, reach.r FROM reach JOIN e ON e.a = reach.v),
lab AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
sz AS (SELECT cluster_id, count(*) AS n FROM lab GROUP BY cluster_id)
SELECT lab.doc_id, lab.cluster_id, CAST(sz.n AS BIGINT) AS cluster_size
FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id
"""

    sql["dedup_exact"] = """
SELECT sha256(text) AS text_sha256, min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY sha256(text) ORDER BY text_sha256
"""

    # header = first 8 CODE UNITS hex-encoded (== first 8 bytes on the ASCII
    # synthetic corpus; engine slices the payload's bytes)
    # substring AFTER encode: the header is the first 8 payload BYTES (the
    # engine's magic-byte slice), not the first 8 characters — char-based
    # slicing diverges on multibyte text (pinned by the hostile sweep)
    sql["multimodal_features"] = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       lower(substring(hex(encode(text)), 1, 16)) AS header_hex
FROM documents ORDER BY doc_id
"""

    # media_decode wraps doc_id into REAL BMP/WAV containers whose header
    # fields are pure functions of doc_id (training.py _bmp_payload /
    # _wav_payload) — the oracle recomputes those functions arithmetically,
    # verifying the byte-level decode exactly.
    sql["media_decode"] = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
       CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 64 AS BIGINT) END AS width,
       CASE WHEN doc_id % 2 = 0 THEN CAST(1 + (doc_id // 64) % 64 AS BIGINT) END AS height,
       CASE WHEN doc_id % 2 = 1 THEN CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) END AS sample_rate,
       CASE WHEN doc_id % 2 = 1 THEN CAST(2 * (1 + doc_id % 100) AS BIGINT) END AS data_bytes
FROM documents ORDER BY doc_id
"""

    sql["events_latest"] = """
SELECT user_id, event_type, ts AS last_ts, event_id AS last_event_id,
       value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
ORDER BY user_id, event_type
"""

    sql["events_window"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(max(event_id) AS BIGINT) AS max_event_id
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

    # as-of join: window-function formulation (explicit ts-desc, event_id-desc
    # tiebreak — deterministic, unlike bare ASOF JOIN on tied timestamps)
    sql["events_asof"] = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
j AS (SELECT p.event_id, p.user_id, p.ts,
             s.event_id AS s_id, s.ts AS s_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY s.ts DESC, s.event_id DESC) AS rn
      FROM p LEFT JOIN s ON s.user_id = p.user_id AND s.ts <= p.ts)
SELECT event_id, user_id, ts, s_id AS signup_event_id, s_ts AS signup_ts
FROM j WHERE rn = 1 ORDER BY event_id
"""

    sql["events_band_join"] = """
SELECT s.user_id,
       s.event_id AS signup_event_id,
       p.event_id AS purchase_event_id,
       CAST((epoch_us(p.ts) - epoch_us(s.ts)) // 1000000 AS BIGINT) AS lag_s
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = s.user_id
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
ORDER BY signup_event_id, purchase_event_id
"""

        # all-pairs exact k-NN graph: rank on full-precision cosine, round-5
    # output (the ann family convention); self excluded
    # zero-norm guard: cosine with a zero vector is undefined — BOTH sides
    # define it as 0.0 (the engine's normalized zero row dots to 0;
    # DuckDB's list_cosine_similarity would return -1 there)
    sql["knn_graph"] = """
WITH sims AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       CASE WHEN list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(a.embedding AS DOUBLE[])) = 0
              OR list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) = 0
            THEN 0.0
            ELSE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))
       END AS cos
  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id),
ranked AS (SELECT vec_id, nbr_id, cos,
       row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id ASC) AS rn
  FROM sims)
SELECT vec_id, nbr_id, CAST(rn - 1 AS BIGINT) AS rank, round(cos, 5) AS cos
FROM ranked WHERE rn <= 5 ORDER BY vec_id, rank
"""

    sql["ann_topk"] = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
sims AS (SELECT q.qid, e.vec_id,
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       CAST(q.qv AS DOUBLE[])) AS cos
         FROM embeddings e CROSS JOIN q),
ranked AS (SELECT qid, vec_id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
           FROM sims)
SELECT qid, vec_id, round(cos, 5) AS cos FROM ranked WHERE rn <= 10
ORDER BY qid, rn
"""

    sql["embedding_dedup"] = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 5) AS cos
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
ORDER BY vec_a, vec_b
"""
    # language-ID heuristic: marker-hit voting, ties → lang asc, 0 hits → und
    from lucene_plugin_ray.pipelines.training import _LANG_MARKERS

    marker_values = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_LANG_MARKERS)
        for w in sorted(_LANG_MARKERS[lang])
    )
    sql["lang_id"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents),
m(lang, term) AS (SELECT * FROM (VALUES {marker_values})),
hits AS (SELECT r.doc_id, m.lang, count(*) AS c FROM raw r JOIN m ON r.term = m.term GROUP BY r.doc_id, m.lang),
best AS (SELECT doc_id, lang,
                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
         FROM hits)
SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
FROM documents d LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY doc_id
"""
    # gap-based sessionization: lag-window new-session flag → running sum →
    # per-(user, session) fold; exact integer-cents sums
    sql["events_sessionize"] = """
WITH o AS (SELECT user_id, event_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
      FROM o)
SELECT user_id,
       CAST(min(event_id) AS BIGINT) AS first_event_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM s GROUP BY user_id, sess
ORDER BY user_id, session_start
"""

    # composed curation chain: quality + language filter + normalized-stream
    # exact dedup (keep min doc_id per fingerprint) — mirrors
    # training.corpus_curation thresholds exactly (unrounded ratio compare)
    sql["corpus_curation"] = f"""
WITH raw AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents),
ne AS (SELECT doc_id, term FROM raw WHERE term <> ''),
agg AS (SELECT doc_id, count(*) AS n_all,
               sum(CASE WHEN term IN {SQL_STOPWORD_LIST} THEN 1 ELSE 0 END) AS n_stop
        FROM ne GROUP BY doc_id),
m(lang, term) AS (SELECT * FROM (VALUES {marker_values})),
hits AS (SELECT r.doc_id, m.lang, count(*) AS c FROM ne r JOIN m ON r.term = m.term GROUP BY r.doc_id, m.lang),
best AS (SELECT doc_id, lang,
                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
         FROM hits),
fp AS (SELECT doc_id,
              sha256(coalesce(array_to_string(
                list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '' AND length(x) <= 255
                                 AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, x)),
                ' '), '')) AS fp_sha256
       FROM documents),
feat AS (SELECT a.doc_id,
                coalesce(b.lang, 'und') AS pred_lang,
                CAST(a.n_all AS BIGINT) AS n_tokens_all,
                round(a.n_stop * 1.0 / greatest(a.n_all, 1), 6) AS stop_ratio,
                a.n_stop * 1.0 / greatest(a.n_all, 1) AS stop_ratio_raw,
                fp.fp_sha256
         FROM agg a
         LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
         JOIN fp USING (doc_id)),
kept AS (SELECT * FROM feat
         WHERE n_tokens_all >= 15 AND stop_ratio_raw <= 0.15 AND pred_lang <> 'und'),
dedup AS (SELECT *, row_number() OVER (PARTITION BY fp_sha256 ORDER BY doc_id) AS rn2
          FROM kept)
SELECT doc_id, pred_lang, n_tokens_all, stop_ratio, fp_sha256
FROM dedup WHERE rn2 = 1 ORDER BY doc_id
"""

    # exact substring-level duplication: every 8-token window of the analyzed
    # stream occurring in >1 document (span-level dedup)
    sql["dedup_ngram_spans"] = f"""
WITH toks AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '' AND length(x) <= 255
                     AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, x)) AS ts
  FROM documents),
w AS (SELECT doc_id, array_to_string(list_slice(ts, i, i + 7), ' ') AS ngram
      FROM toks CROSS JOIN UNNEST(range(1, greatest(len(ts) - 6, 1))) AS t(i)),
d AS (SELECT DISTINCT ngram, doc_id FROM w)
SELECT ngram, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id
FROM d GROUP BY ngram HAVING count(*) > 1 ORDER BY ngram
"""

    # per-document span-duplication fraction (windows shared with >=1 other
    # document / total distinct windows)
    sql["doc_dup_stats"] = f"""
WITH toks AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '' AND length(x) <= 255
                     AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, x)) AS ts
  FROM documents),
w AS (SELECT DISTINCT doc_id, array_to_string(list_slice(ts, i, i + 7), ' ') AS ngram
      FROM toks CROSS JOIN UNNEST(range(1, greatest(len(ts) - 6, 1))) AS t(i)),
cnt AS (SELECT ngram, count(*) AS n_docs FROM w GROUP BY ngram),
per AS (SELECT w.doc_id, count(*) AS n_windows,
               sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup
        FROM w JOIN cnt c USING (ngram) GROUP BY w.doc_id)
SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows,
       CAST(n_dup AS BIGINT) AS n_dup_windows,
       round(n_dup * 1.0 / n_windows, 6) AS dup_fraction
FROM per ORDER BY doc_id
"""

    # BPE-ish pre-tokenizer count — IDENTICAL RE2 pattern on both sides
    from lucene_plugin_ray.pipelines.training import BPE_TOKEN_PATTERN

    bpe_pat = BPE_TOKEN_PATTERN.replace("'", "''")
    sql["token_count_bpe"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{bpe_pat}')) AS BIGINT) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""

    # Gopher-style word-repetition signals: words = text split on single
    # spaces, empties dropped; bigrams = adjacent surviving words per doc.
    sql["repetition_stats"] = """
WITH pos AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id,
           unnest(words) AS word,
           unnest(range(1, len(words) + 1)) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))
  WHERE word <> ''
),
wc AS (SELECT doc_id, word, count(*) AS c FROM pos GROUP BY doc_id, word),
agg AS (SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS distinct_words,
               CAST(max(c) AS BIGINT) AS top_word_count
        FROM wc GROUP BY doc_id),
b AS (SELECT doc_id,
             word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
      FROM pos),
bc AS (SELECT doc_id, bg, count(*) AS c FROM b WHERE bg IS NOT NULL GROUP BY doc_id, bg),
btop AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count FROM bc GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.distinct_words, 0) AS BIGINT) AS distinct_words,
       round((coalesce(a.n_words, 0) - coalesce(a.distinct_words, 0))
             / CAST(greatest(coalesce(a.n_words, 0), 1) AS DOUBLE), 6) AS dup_word_fraction,
       CAST(coalesce(a.top_word_count, 0) AS BIGINT) AS top_word_count,
       CAST(coalesce(bt.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       round(coalesce(bt.top_bigram_count, 0)
             / CAST(greatest(coalesce(a.n_words, 0) - 1, 1) AS DOUBLE), 6) AS top_bigram_fraction
FROM documents d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN btop bt USING (doc_id)
ORDER BY doc_id
"""

    # overlapping fixed-window chunking: chunk i covers chars
    # [i*stride, i*stride + window), emitted while i*stride < length(text)
    sql["chunk_text"] = """
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       substr(text, CAST(chunk_idx * 120 + 1 AS BIGINT), 160) AS chunk_text
FROM (SELECT doc_id, text,
             unnest(range((length(text) + 119) // 120)) AS chunk_idx
      FROM documents)
ORDER BY doc_id, chunk_idx
"""

    # text cleaning — the SAME RE2 patterns run verbatim on both sides
    # (Arrow and DuckDB are both RE2, so replacement semantics are
    # bit-identical by construction)
    from lucene_plugin_ray.pipelines.training import (
        TEXT_CLEAN_EMAIL_PATTERN,
        TEXT_CLEAN_URL_PATTERN,
        TEXT_CLEAN_WS_PATTERN,
    )

    url_p, email_p, ws_p = (
        TEXT_CLEAN_URL_PATTERN,
        TEXT_CLEAN_EMAIL_PATTERN,
        TEXT_CLEAN_WS_PATTERN,
    )
    sql["text_clean"] = f"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(text,
            '{url_p}', '<url>', 'g'),
            '{email_p}', '<email>', 'g'),
            '{ws_p}', ' ', 'g'), ' ') AS clean_text,
       CAST(len(regexp_extract_all(text, '{url_p}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(
            regexp_replace(text, '{url_p}', '<url>', 'g'),
            '{email_p}')) AS BIGINT) AS n_emails
FROM documents ORDER BY doc_id
"""

    # PII redaction on deterministically injected contact strings (the
    # corpus carries no PII — the injection keeps the oracle non-vacuous;
    # pipelines/training.py::pii_redact performs the identical append)
    from lucene_plugin_ray.pipelines.training import (
        PII_EMAIL_PATTERN as _pe,
        PII_IP_PATTERN as _pi,
        PII_PHONE_PATTERN as _pp,
    )

    _pii_src = (
        "text || ' contact user' || doc_id || '@mail' || (doc_id % 7) || "
        "'.com tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)"
    )
    _pii_after_email = f"regexp_replace({_pii_src}, '{_pe}', '<EMAIL>', 'g')"
    _pii_after_phone = (
        f"regexp_replace({_pii_after_email}, '{_pp}', '<PHONE>', 'g')"
    )
    # Gopher-rules quality filter: identical deterministic injection in
    # SQL (bullets %5 / ellipsis lines %7 / hash symbols %11 / numeric
    # words %13 — pipelines/training.py::gopher_quality), ratios in
    # integer micro units via floor(x*1e6 + 0.5) so numpy and DuckDB
    # round identically, verdict = integer threshold compares
    sql["gopher_quality"] = r"""
WITH t AS (SELECT doc_id, text
  || CASE WHEN doc_id % 5 = 0 THEN repeat(chr(10) || '- gopher bullet line', 12) ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'to be continued...' || chr(10) || 'more to come...' ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN ' # # # # # # # # #' ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' 00 11 22 33 44 55 66 77 88 99' ELSE '' END AS txt
  FROM documents),
w AS (SELECT doc_id, txt,
        list_filter(string_split_regex(txt, '\s+'), x -> x <> '') AS words,
        string_split(txt, chr(10)) AS lines
      FROM t),
m AS (SELECT doc_id,
        len(words) AS n_words,
        len(lines) AS n_lines,
        coalesce(list_sum(list_transform(words, x -> length(x))), 0) AS sum_len,
        len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
        len(list_filter(lines, x -> x LIKE '- %')) AS n_bullet,
        len(list_filter(lines, x -> x LIKE '%...')) AS n_ell_lines,
        length(txt) - length(replace(txt, '#', '')) AS n_hash,
        len(regexp_extract_all(txt, '\.\.\.')) AS n_esym,
        (CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'be') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'have') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'that') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(words, 'with') THEN 1 ELSE 0 END) AS req_stop_hits
      FROM w) ,
r AS (SELECT doc_id,
        CAST(n_words AS BIGINT) AS n_words,
        CAST(n_lines AS BIGINT) AS n_lines,
        CAST(floor(sum_len * 1.0 / greatest(n_words, 1) * 1e6 + 0.5) AS BIGINT) AS mean_word_len_micro,
        CAST(floor((n_hash + n_esym) * 1.0 / greatest(n_words, 1) * 1e6 + 0.5) AS BIGINT) AS symbol_ratio_micro,
        CAST(floor(n_bullet * 1.0 / greatest(n_lines, 1) * 1e6 + 0.5) AS BIGINT) AS bullet_frac_micro,
        CAST(floor(n_ell_lines * 1.0 / greatest(n_lines, 1) * 1e6 + 0.5) AS BIGINT) AS ellipsis_frac_micro,
        CAST(floor(n_alpha * 1.0 / greatest(n_words, 1) * 1e6 + 0.5) AS BIGINT) AS alpha_frac_micro,
        CAST(req_stop_hits AS BIGINT) AS req_stop_hits
      FROM m)
SELECT *,
  CAST((n_words BETWEEN 50 AND 100000)
   AND (mean_word_len_micro BETWEEN 3000000 AND 10000000)
   AND (symbol_ratio_micro <= 100000)
   AND (bullet_frac_micro <= 900000)
   AND (ellipsis_frac_micro <= 300000)
   AND (alpha_frac_micro >= 800000)
   AND (req_stop_hits >= 2) AS BIGINT) AS passes
FROM r ORDER BY doc_id
"""

    # percolator: per registered query its boolean match set, tagged with
    # the query id — pure integer output
    sql["percolate"] = f"""
{_toks_cte()},
d AS (SELECT DISTINCT doc_id, term FROM toks),
q0 AS (SELECT DISTINCT doc_id, 0 AS query_id FROM d WHERE term = 'spark'),
q1 AS (SELECT doc_id, 1 AS query_id FROM d WHERE term IN ('spark', 'merge')
       GROUP BY doc_id HAVING count(DISTINCT term) = 2),
q2 AS (SELECT doc_id, 2 AS query_id FROM d
       WHERE term IN ('spark', 'window')
         AND doc_id NOT IN (SELECT doc_id FROM d WHERE term = 'merge')
       GROUP BY doc_id),
q3 AS (SELECT doc_id, 3 AS query_id FROM d WHERE term IN ('merge', 'stream')
       GROUP BY doc_id),
tl AS (SELECT doc_id,
       {_SQL_POSITIONED_TOKS.format(stop=_SQL_STOP_LIST_LITERAL)} AS toks
       FROM documents),
q4 AS (SELECT doc_id, 4 AS query_id FROM tl
       WHERE len(list_filter(range(1, len(toks)),
             i -> toks[i] = 'spark' AND toks[i + 1] = 'merge')) > 0),
q5 AS (SELECT tl.doc_id, 5 AS query_id FROM tl
       JOIN (SELECT DISTINCT doc_id FROM d WHERE term = 'window') w
         ON w.doc_id = tl.doc_id
       WHERE len(list_filter(
             list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark'),
             pa -> coalesce(list_min(list_transform(
                   list_filter(range(1, len(toks)+1),
                               j -> toks[j] = 'merge'),
                   pb -> abs(pb - 1 - pa))), 99) <= 2)) > 0)
SELECT doc_id, CAST(query_id AS BIGINT) AS query_id FROM
(SELECT * FROM q0 UNION ALL SELECT * FROM q1
 UNION ALL SELECT * FROM q2 UNION ALL SELECT * FROM q3
 UNION ALL SELECT * FROM q4 UNION ALL SELECT * FROM q5)
ORDER BY doc_id, query_id
"""

    # C4 cleaning (Raffel et al. 2020 §2.2): line keep-conditions inside a
    # list_filter lambda (order-preserving, mirroring the engine's masked
    # join), page rules as plain predicates — all integer/boolean output
    sql["c4_filter"] = r"""
WITH t AS (SELECT doc_id, text
  || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'this is a clean retained sentence number one.' || chr(10) || 'this is a clean retained sentence number two.' || chr(10) || 'this is a clean retained sentence number three.' ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'short line.' ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'please enable javascript to view the content here.' ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' { }' ELSE '' END AS txt
  FROM documents),
w AS (SELECT doc_id, txt,
        string_split(txt, chr(10)) AS lines,
        list_filter(string_split(txt, chr(10)), x ->
          regexp_matches(trim(x, ' '), '[.!?"]$')
          AND len(list_filter(string_split_regex(x, '\s+'), y -> y <> '')) >= 5
          AND NOT contains(lower(x), 'javascript')) AS kept
      FROM t)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS kept_lines,
       CAST(contains(lower(txt), 'lorem ipsum') AS BIGINT) AS has_lorem,
       CAST(contains(txt, '{') AS BIGINT) AS has_brace,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       CAST(NOT contains(lower(txt), 'lorem ipsum')
        AND NOT contains(txt, '{')
        AND len(kept) >= 3 AS BIGINT) AS passes
FROM w ORDER BY doc_id
"""

    sql["pii_redact"] = f"""
SELECT doc_id,
       regexp_replace({_pii_after_phone}, '{_pi}', '<IP>', 'g') AS text_redacted,
       CAST(len(regexp_extract_all({_pii_src}, '{_pe}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({_pii_after_email}, '{_pp}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all({_pii_after_phone}, '{_pi}')) AS BIGINT) AS n_ips
FROM documents ORDER BY doc_id
"""

    # content-hash train/val split on the fingerprint's first byte
    sql["dataset_split"] = f"""
WITH fp AS (SELECT doc_id,
       sha256(coalesce(array_to_string(
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '' AND length(x) <= 255
                          AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, x)),
         ' '), '')) AS fp_sha256
  FROM documents)
SELECT doc_id, fp_sha256,
       CASE WHEN substr(fp_sha256, 1, 2) < 'f3' THEN 'train' ELSE 'val' END AS split
FROM fp ORDER BY doc_id
"""

    # decontamination: distinct 8-token windows vs the stand-in eval set
    # (windows of every doc_id % 97 == 0 document)
    # heavy hitters: terms with count > N/28 — the Ray op discovers them
    # with a bounded Misra-Gries sketch then exact-confirms, so the output
    # is exact and hash-comparable (decontaminate_bloom stays rows-only:
    # approximate by design, property-tested against the exact twin)
    sql["heavy_hitters"] = f"""
{_toks_cte()},
tc AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM tc)
SELECT term, CAST(cnt AS BIGINT) AS cnt, n AS n_total
FROM tc CROSS JOIN tot WHERE cnt * 28 > n ORDER BY term
"""

    sql["decontaminate"] = f"""
WITH toks AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '' AND length(x) <= 255
                     AND NOT list_contains({_SQL_STOP_LIST_LITERAL}, x)) AS ts
  FROM documents),
w AS (SELECT doc_id, array_to_string(list_slice(ts, i, i + 7), ' ') AS ngram
      FROM toks CROSS JOIN UNNEST(range(1, greatest(len(ts) - 6, 1))) AS t(i)),
d AS (SELECT DISTINCT ngram, doc_id FROM w),
ev AS (SELECT DISTINCT ngram FROM d WHERE doc_id % 97 = 0),
per AS (SELECT d.doc_id, count(*) AS n_windows,
               sum(CASE WHEN ev.ngram IS NOT NULL THEN 1 ELSE 0 END) AS n_cont
        FROM d LEFT JOIN ev USING (ngram) GROUP BY d.doc_id)
SELECT dd.doc_id,
       CAST(coalesce(per.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(per.n_cont, 0) AS BIGINT) AS n_contaminated,
       round(coalesce(per.n_cont, 0)
             / CAST(greatest(coalesce(per.n_windows, 0), 1) AS DOUBLE), 6)
         AS contaminated_fraction
FROM documents dd LEFT JOIN per USING (doc_id) ORDER BY dd.doc_id
"""

    # sequence packing by global token-prefix offset (budget 2048): the
    # window sum mirrors the engine's distributed two-pass prefix scan
    sql["pack_sequences"] = f"""
{_toks_cte()},
dl AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
c AS (SELECT d.doc_id, coalesce(dl.n_tokens, 0) AS n_tokens
      FROM documents d LEFT JOIN dl USING (doc_id)),
p AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tokens_before
      FROM c)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tokens_before AS BIGINT) AS tokens_before,
       CAST(tokens_before // 2048 AS BIGINT) AS pack_id
FROM p ORDER BY doc_id
"""

    # flat-JSON property extraction from events.props (absent key → NULL on
    # both sides)
    # strict-integer k (bare or quoted digits); the regex guard matters:
    # a plain CAST would ROUND a float k (7.5 -> 8) where the engine's
    # delimiter-anchored RE2 yields NULL
    # json_valid guard: malformed / empty props yield NULL instead of a
    # parse error — the engine's regex extraction is null-graceful there too
    sql["events_props_extract"] = """
SELECT event_id,
       CASE WHEN json_valid(props)
                 AND regexp_matches(
                       coalesce(json_extract_string(props, '$.k'), ''),
                       '^-?[0-9]+$')
            THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k_value
FROM events ORDER BY event_id
"""

    # per-(source, lang) corpus profile
    sql["source_stats"] = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(sum(n_chars) * 1.0 / count(*), 6) AS avg_chars
FROM documents GROUP BY source, lang ORDER BY source, lang
"""

    # per-source quota sample: content-hash-ranked top-N per source
    sql["source_sample"] = """
WITH h AS (SELECT doc_id, source, sha256(coalesce(text, '')) AS content_sha
           FROM documents),
ranked AS (SELECT *, row_number() OVER (PARTITION BY source
                                        ORDER BY content_sha, doc_id) AS r
           FROM h)
SELECT doc_id, source, content_sha FROM ranked WHERE r <= 3 ORDER BY doc_id
"""

    # per-doc top-k TF-IDF terms; rank on the ROUNDED score (ties -> term
    # asc) so both sides pick identical boundary rows
    sql["tfidf_topk"] = f"""
{_toks_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (SELECT tf.doc_id, tf.term, tf.tf,
                  round((ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) * tf.tf, 6) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC) AS r
           FROM scored)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score
FROM ranked WHERE r <= 5 ORDER BY doc_id, term
"""

    # corpus bigram count table (words = single-space split, empties
    # dropped — the repetition_stats word spec; bigrams pair ADJACENT
    # surviving words, so lead() runs after the empty filter)
    sql["ngram_counts"] = """
WITH pos AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id, unnest(words) AS word, unnest(range(1, len(words) + 1)) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))
  WHERE word <> ''
),
b AS (SELECT doc_id,
             word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS ngram
      FROM pos)
SELECT ngram,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM b WHERE ngram IS NOT NULL GROUP BY ngram ORDER BY ngram
"""

    # collocation PMI over the ngram_counts bigram table (same word spec);
    # micro-nat integer quantization, formula text mirrored in training.py
    sql["collocations"] = """
WITH pos AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id, unnest(words) AS word, unnest(range(1, len(words) + 1)) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))
  WHERE word <> ''
),
uni AS (SELECT word, count(*) AS c FROM pos GROUP BY word),
tu AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
b AS (SELECT doc_id,
             word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS ngram
      FROM pos),
bg AS (SELECT ngram, count(*) AS n_occ FROM b WHERE ngram IS NOT NULL GROUP BY ngram),
tb AS (SELECT CAST(sum(n_occ) AS BIGINT) AS t FROM bg),
sel AS (SELECT ngram, n_occ,
               string_split(ngram, ' ')[1] AS w1,
               string_split(ngram, ' ')[2] AS w2
        FROM bg WHERE n_occ >= 5)
SELECT sel.ngram AS ngram, CAST(sel.n_occ AS BIGINT) AS n_occ,
       CAST(round(ln((sel.n_occ * 1.0 * tu.t * tu.t)
                     / (tb.t * 1.0 * u1.c * u2.c)) * 1e6) AS BIGINT) AS pmi_micro
FROM sel
JOIN uni u1 ON u1.word = sel.w1
JOIN uni u2 ON u2.word = sel.w2
CROSS JOIN tu CROSS JOIN tb
ORDER BY ngram
"""

    # block-level exact dedup with rewrite: blocks are runs of 16 surviving
    # surface words (ngram_counts word spec); corpus-first (min packed
    # (doc_id, block_idx), 20-bit idx) wins; documents re-join survivors.
    sql["paragraph_dedup"] = """
WITH w AS (
  SELECT doc_id, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS seq
  FROM (
    SELECT doc_id, unnest(words) AS word, unnest(range(1, len(words) + 1)) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))
  WHERE word <> ''
),
blk AS (SELECT doc_id, seq // 16 AS bidx,
               string_agg(word, ' ' ORDER BY seq) AS btext
        FROM w GROUP BY doc_id, seq // 16),
win AS (SELECT btext, min(doc_id * 1048576 + bidx) AS winner, count(*) AS n_occ
        FROM blk GROUP BY btext),
keep AS (SELECT b.doc_id, b.bidx, b.btext,
                (v.n_occ = 1 OR b.doc_id * 1048576 + b.bidx = v.winner) AS kept
         FROM blk b JOIN win v USING (btext)),
per_doc AS (SELECT doc_id,
                   count(*) AS n_blocks,
                   sum(CASE WHEN kept THEN 0 ELSE 1 END) AS n_dup_blocks,
                   string_agg(CASE WHEN kept THEN btext END, ' '
                              ORDER BY bidx) AS clean_text
            FROM keep GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(p.n_blocks, 0) AS BIGINT) AS n_blocks,
       CAST(coalesce(p.n_dup_blocks, 0) AS BIGINT) AS n_dup_blocks,
       coalesce(p.clean_text, '') AS clean_text
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""

    # exact per-source token-length quantiles: smallest length with
    # cum·100 ≥ total·p (identical integer threshold on both sides)
    sql["length_quantiles"] = f"""
{_toks_cte()},
dl AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
docs AS (SELECT d.source, coalesce(dl.n, 0) AS n_tokens
         FROM documents d LEFT JOIN dl USING (doc_id)),
hist AS (SELECT source, n_tokens, count(*) AS c FROM docs
         GROUP BY source, n_tokens),
cum AS (SELECT source, n_tokens, c,
               sum(c) OVER (PARTITION BY source ORDER BY n_tokens) AS cm,
               sum(c) OVER (PARTITION BY source) AS total
        FROM hist),
q AS (SELECT source,
             min(CASE WHEN cm * 100 >= total * 10 THEN n_tokens END) AS p10,
             min(CASE WHEN cm * 100 >= total * 50 THEN n_tokens END) AS p50,
             min(CASE WHEN cm * 100 >= total * 90 THEN n_tokens END) AS p90,
             min(CASE WHEN cm * 100 >= total * 99 THEN n_tokens END) AS p99
      FROM cum GROUP BY source),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        FROM docs GROUP BY source)
SELECT t.source, t.n_docs, t.sum_tokens,
       CAST(q.p10 AS BIGINT) AS p10, CAST(q.p50 AS BIGINT) AS p50,
       CAST(q.p90 AS BIGINT) AS p90, CAST(q.p99 AS BIGINT) AS p99
FROM tot t JOIN q USING (source) ORDER BY t.source
"""

    # integer-exact DDSketch-style quantile sketch: cents < 32 exact, else
    # 32 sub-buckets per octave (key = 32·(bitlen−6) + cents>>(bitlen−6));
    # quantile = lower bound of the smallest bucket with cum·100 ≥ n·p —
    # every step integer, so the sketch itself is hash-checked
    sql["value_quantiles_sketch"] = """
WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
k AS (SELECT event_type,
             CASE WHEN cents < 32 THEN cents
                  ELSE 32 * (length(format('{:b}', cents)) - 6)
                       + (cents >> (length(format('{:b}', cents)) - 6)) END AS key
      FROM c),
h AS (SELECT event_type, key, count(*) AS cnt FROM k GROUP BY event_type, key),
cum AS (SELECT event_type, key,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY key) AS cm,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM h),
q AS (SELECT event_type, any_value(n) AS n,
             min(CASE WHEN cm * 100 >= n * 50 THEN key END) AS k50,
             min(CASE WHEN cm * 100 >= n * 90 THEN key END) AS k90,
             min(CASE WHEN cm * 100 >= n * 99 THEN key END) AS k99
      FROM cum GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(CASE WHEN k50 < 32 THEN k50 ELSE ((k50 % 32) + 32) << (k50 // 32 - 1) END AS BIGINT) AS p50_cents,
       CAST(CASE WHEN k90 < 32 THEN k90 ELSE ((k90 % 32) + 32) << (k90 // 32 - 1) END AS BIGINT) AS p90_cents,
       CAST(CASE WHEN k99 < 32 THEN k99 ELSE ((k99 % 32) + 32) << (k99 // 32 - 1) END AS BIGINT) AS p99_cents
FROM q ORDER BY event_type
"""

    # trailing 1-hour RANGE frame (peers at the anchor ts included)
    sql["events_rolling"] = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_win,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS win_sum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

    # Q1-shaped pricing summary — each FIELD rounds to integer units once
    # (cents / percent), all derived measures are pure-int products, so the
    # engine's int64 folds and DuckDB's HUGEINT sums agree exactly
    sql["pricing_summary"] = """
WITH u AS (SELECT l_returnflag, l_linestatus,
                  CAST(round(l_quantity * 100) AS BIGINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS base,
                  CAST(round(l_discount * 100) AS BIGINT) AS d,
                  CAST(round(l_tax * 100) AS BIGINT) AS t
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(qty) AS BIGINT) AS sum_qty_x100,
       CAST(sum(base) AS BIGINT) AS sum_base_cents,
       CAST(sum(base * (100 - d)) AS BIGINT) AS sum_disc_units,
       CAST(sum(base * (100 - d) * (100 + t)) AS BIGINT) AS sum_charge_units
FROM u GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

    sql["top_suppliers"] = """
WITH rev AS (SELECT l_suppkey AS s_suppkey,
                    CAST(count(*) AS BIGINT) AS n_items,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         AS BIGINT) AS revenue_units
             FROM lineitem GROUP BY l_suppkey)
SELECT r.s_suppkey, s.s_name, n.n_name, r.n_items, r.revenue_units
FROM rev r
JOIN supplier s USING (s_suppkey)
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY r.revenue_units DESC, r.s_suppkey LIMIT 10
"""

    # big⨝big co-partitioned join rolled to order status; LEFT join so
    # orders without lineitems count with zero lines
    sql["order_line_rollup"] = """
WITH lv AS (SELECT l_orderkey,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS rev
            FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN lv.l_orderkey IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_orders_with_lines,
       CAST(coalesce(sum(lv.n_lines), 0) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(lv.rev), 0) AS BIGINT) AS revenue_units
FROM orders o LEFT JOIN lv ON lv.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
"""

    # funnel with embedded anti-join: conversion_us NULL = never purchased
    # at or after the first signup
    sql["user_funnel"] = """
WITH s AS (SELECT user_id, min(ts) AS first_signup FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id,
             min(epoch_us(e.ts) - epoch_us(s.first_signup)) AS conv_us
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.first_signup
      GROUP BY e.user_id),
c AS (SELECT user_id,
             count(*) FILTER (event_type = 'signup') AS n_signups,
             count(*) FILTER (event_type = 'purchase') AS n_purchases
      FROM events GROUP BY user_id)
SELECT s.user_id,
       CAST(c.n_signups AS BIGINT) AS n_signups,
       CAST(c.n_purchases AS BIGINT) AS n_purchases,
       s.first_signup AS first_signup_ts,
       CAST(p.conv_us AS BIGINT) AS conversion_us
FROM s JOIN c USING (user_id) LEFT JOIN p USING (user_id)
ORDER BY s.user_id
"""

    # hopping windows: 1 h window, 15 min hop — every event in exactly 4
    # window starts (floor(ts/hop)·hop − k·hop, k < 4, start > ts − window)
    sql["events_hopping"] = """
WITH p AS (SELECT epoch_us(ts) AS tus, event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
w AS (SELECT make_timestamp((tus // 900000000) * 900000000
                            - k.k * 900000000) AS window_start,
             event_type, cents
      FROM p, (SELECT unnest(range(4)) AS k) k
      WHERE (tus // 900000000) * 900000000 - k.k * 900000000
            > tus - 3600000000)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM w GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""

    # seeded shuffle: shard = first two hex nibbles of sha256("0:<doc_id>"),
    # pos = rank within shard by (key, doc_id)
    sql["deterministic_shuffle"] = """
WITH k AS (SELECT doc_id, sha256('0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
           FROM documents),
s AS (SELECT doc_id, shuffle_key,
             (instr('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1) * 16
             + instr('0123456789abcdef', substr(shuffle_key, 2, 1)) - 1 AS shard
      FROM k)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS pos,
       shuffle_key
FROM s ORDER BY shard, pos
"""

    sql["revenue_by_region"] = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name ORDER BY r.r_name
"""

    sql["revenue_by_part_type"] = """
SELECT p.p_type,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_units
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_type ORDER BY p.p_type
"""

    sql["length_rank"] = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rank() OVER (ORDER BY n_chars DESC) AS BIGINT) AS rank,
       CAST(dense_rank() OVER (ORDER BY n_chars DESC) AS BIGINT) AS dense_rank
FROM documents ORDER BY doc_id
"""

    # char-bigram LM fit on the corpus itself; per-bigram cost quantized to
    # integer centibits so document scores are exact integer sums
    sql["charlm_logprob"] = """
WITH pos AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS bg FROM (
    SELECT doc_id, text, unnest(range(1, length(text))) AS i FROM documents)),
cnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY bg),
pre AS (SELECT substr(bg, 1, 1) AS a, sum(c) AS pcnt FROM cnt GROUP BY 1),
cost AS (SELECT bg, CAST(round(100 * log2(c * 1.0 / pcnt)) AS BIGINT) AS q
         FROM cnt JOIN pre ON substr(cnt.bg, 1, 1) = pre.a),
sc AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              CAST(sum(cost.q) AS BIGINT) AS logprob_q
       FROM pos p JOIN cost USING (bg) GROUP BY p.doc_id)
SELECT d.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sc.logprob_q, 0) AS BIGINT) AS logprob_q
FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id
"""

    sql["distinct_users"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""

    sql["revenue_by_nation"] = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""

    # dedup_minhash, minhash_clusters, simhash, ann_ivf, ann_lsh, ann_pq,
    # distinct_users_hll: approximate / LSH/PQ/sketch-based — not
    # SQL-expressible; the driver records rows-only checks (ann_pq recall
    # vs exact ann_topk, minhash_clusters pair-consistency, and the HLL
    # error bound vs exact distinct pinned in tests).
    # embedding_cluster / semantic_dedup: iterative (distributed Lloyd
    # k-means; SemDeDup keep-per-component) — rows-only; pinned by
    # determinism/assignment property tests (tests/test_kmeans.py).
    sql["check_index"] = f"""
{_toks_cte()},
lraw AS ({_TOKS.format(col="lang")}),
ltoks AS (SELECT doc_id, term FROM lraw WHERE term <> '' AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
sraw AS ({_TOKS.format(col="source")}),
stoks AS (SELECT doc_id, term FROM sraw WHERE term <> '' AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
post AS (
  SELECT DISTINCT 'text' AS field, doc_id, term FROM toks
  UNION ALL SELECT DISTINCT 'lang' AS field, doc_id, term FROM ltoks
  UNION ALL SELECT DISTINCT 'source' AS field, doc_id, term FROM stoks
)
SELECT CAST(0 AS BIGINT) AS generation,
       CAST(8 AS BIGINT) AS n_partitions,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM post) AS n_postings,
       TRUE AS all_ok
"""

    # per-partition census: the partitioner itself recomputed in SQL —
    # FNV-1a-64 (recursive CTE over the key bytes) + the mix64 finalizer
    # (32-bit-split modular multiplies) % P, bit-exact vs
    # functions/hashing.py partition_of_key
    sql["check_index_partitions"] = f"""
WITH RECURSIVE {_toks_cte()[5:]},
lraw AS ({_TOKS.format(col="lang")}),
ltoks AS (SELECT doc_id, term FROM lraw WHERE term <> '' AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
sraw AS ({_TOKS.format(col="source")}),
stoks AS (SELECT doc_id, term FROM sraw WHERE term <> '' AND length(term) <= 255 AND term NOT IN {SQL_STOPWORD_LIST}),
post AS (
  SELECT DISTINCT 'text' AS field, doc_id, term FROM toks
  UNION ALL SELECT DISTINCT 'lang' AS field, doc_id, term FROM ltoks
  UNION ALL SELECT DISTINCT 'source' AS field, doc_id, term FROM stoks
),
keys AS (
  SELECT doc_id,
         'default' || chr(0) || 'doc://' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS key
  FROM documents
),
fnv AS (
  SELECT doc_id, key, 1 AS i, CAST(14695981039346656037 AS UBIGINT) AS h FROM keys
  UNION ALL
  SELECT doc_id, key, i + 1,
    CAST((CAST(xor(h, CAST(ord(substr(key, i, 1)) AS UBIGINT)) AS HUGEINT) * 1099511628211)
         % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT)
  FROM fnv WHERE i <= length(key)
),
m1 AS (
  SELECT doc_id, CAST((CAST(h AS HUGEINT) + 11400714819323198485)
                      % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT) AS z
  FROM fnv WHERE i = length(key) + 1
),
m2 AS (SELECT doc_id, CAST((((CAST(xor(z, z >> 30) >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296 + (CAST(xor(z, z >> 30) & 4294967295 AS HUGEINT) * 13787848793156543929)) % 18446744073709551616 AS UBIGINT) AS z FROM m1),
m3 AS (SELECT doc_id, CAST((((CAST(xor(z, z >> 27) >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296 + (CAST(xor(z, z >> 27) & 4294967295 AS HUGEINT) * 10723151780598845931)) % 18446744073709551616 AS UBIGINT) AS z FROM m2),
part AS (SELECT doc_id, CAST(xor(z, z >> 31) % 8 AS BIGINT) AS partition FROM m3),
docs_per AS (SELECT partition, CAST(count(*) AS BIGINT) AS n_docs FROM part GROUP BY partition),
terms_per AS (
  SELECT p.partition,
         CAST(count(DISTINCT po.field || chr(1) || po.term) AS BIGINT) AS n_terms,
         CAST(count(*) AS BIGINT) AS n_postings
  FROM post po JOIN part p USING (doc_id) GROUP BY p.partition
)
SELECT d.partition, d.n_docs,
       COALESCE(t.n_terms, 0) AS n_terms,
       COALESCE(t.n_postings, 0) AS n_postings,
       TRUE AS ok
FROM docs_per d LEFT JOIN terms_per t USING (partition)
ORDER BY d.partition
"""

    # replicate census: constants derived from the build config — P=8
    # segment artifacts of 5 files each + 1 manifest of 1 file, nothing
    # skipped on a fresh destination
    sql["index_replicate"] = """
SELECT * FROM (VALUES
  ('manifest', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
  ('segment',  CAST(8 AS BIGINT), CAST(40 AS BIGINT), CAST(0 AS BIGINT))
) AS t(kind, n_artifacts, total_files, n_skipped) ORDER BY kind
"""

    return sql
