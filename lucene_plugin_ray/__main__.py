"""CLI — the `ray job submit` entry surface (SURVEY.md §2.11).

    python -m lucene_plugin_ray build   --corpus pages/ --index /tmp/idx [--partitions 32] [--fields lang,source]
    python -m lucene_plugin_ray delta   --corpus delta/ --index /tmp/idx
    python -m lucene_plugin_ray search  --index /tmp/idx --query "mary lamb" [--collection default] [--limit 10] [--method taat|bmw]
    python -m lucene_plugin_ray compact --index /tmp/idx
    python -m lucene_plugin_ray delete  --index /tmp/idx --collection default --urls u1,u2
    python -m lucene_plugin_ray clear   --index /tmp/idx --collection foo
    python -m lucene_plugin_ray serve   --index /tmp/idx [--host 127.0.0.1] [--port 8080]
    python -m lucene_plugin_ray count   --index /tmp/idx --query "mary lamb"
    python -m lucene_plugin_ray facets  --index /tmp/idx --query "mary" --field lang
    python -m lucene_plugin_ray suggest --index /tmp/idx --term mray [--k 5]
    python -m lucene_plugin_ray complete --index /tmp/idx --prefix ma [--k 5]
    python -m lucene_plugin_ray hybrid  --index /tmp/idx --query "mary lamb" --embeddings dir/ [--qvec-id 0] [--k 10] [--k-leg 20]

On a cluster: `ray job submit -- python -m lucene_plugin_ray build ...`
(the script only calls ray.init when no session exists).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _cfg(args) -> "IndexConfig":
    from lucene_plugin_ray.config import IndexConfig

    fields = tuple(f for f in (args.fields or "").split(",") if f)
    return IndexConfig(
        index_root=args.index,
        num_partitions=args.partitions,
        field_columns=fields,
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lucene_plugin_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("build", "delta"):
        s = sub.add_parser(name)
        s.add_argument("--corpus", required=True, help="parquet path/dir of pages")
        s.add_argument("--index", required=True)
        s.add_argument("--partitions", type=int, default=32)
        s.add_argument("--fields", default="")
    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--method", default="taat", choices=["taat", "bmw"])
    s.add_argument("--after-score", type=float, default=None,
                   help="deep pagination: previous page's last score")
    s.add_argument("--after-url", default=None,
                   help="deep pagination: previous page's last url")
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    for name in ("compact", "clear", "delete"):
        s = sub.add_parser(name)
        s.add_argument("--index", required=True)
        s.add_argument("--partitions", type=int, default=32)
        s.add_argument("--fields", default="")
        if name == "clear":
            s.add_argument("--collection", required=True)
        if name == "delete":
            s.add_argument("--collection", default="default")
            s.add_argument("--urls", required=True, help="comma-separated urls")
    for name in ("count", "facets", "suggest", "complete", "complete-infix"):
        s = sub.add_parser(name)
        s.add_argument("--index", required=True)
        s.add_argument("--collection", default="default")
        s.add_argument("--partitions", type=int, default=32)
        s.add_argument("--fields", default="")
        if name == "suggest":
            s.add_argument("--term", required=True)
            s.add_argument("--k", type=int, default=5)
        elif name == "complete":
            s.add_argument("--prefix", required=True)
            s.add_argument("--k", type=int, default=5)
        elif name == "complete-infix":
            s.add_argument("--fragment", required=True)
            s.add_argument("--k", type=int, default=5)
        else:
            s.add_argument("--query", required=True)
        if name == "facets":
            s.add_argument("--field", required=True)
    s = sub.add_parser("search-filtered")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--filter", required=True)
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-surround")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True,
                   help="surround language: 'a 3W b', '2N(a, b)', AND/OR/NOT")
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-diversified")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--key-field", required=True)
    s.add_argument("--max-per-key", type=int, default=1)
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-common")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--max-term-frequency", type=float, default=0.01)
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-boosting")
    s.add_argument("--index", required=True)
    s.add_argument("--positive", required=True)
    s.add_argument("--negative", required=True)
    s.add_argument("--demote", type=float, default=0.2)
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-expression")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--expression", required=True)
    s.add_argument("--bindings", default="{}",
                   help="JSON object of scalar variable bindings")
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser(
        "span",
        help="span queries (Lucene queries.spans): --kind near|first|not",
    )
    s.add_argument("--index", required=True)
    s.add_argument("--kind", required=True, choices=["near", "first", "not"])
    s.add_argument("--terms", required=True,
                   help="space-separated span terms (near: >=2; "
                        "first/not: the single include term)")
    s.add_argument("--slop", type=int, default=0)
    s.add_argument("--unordered", action="store_true")
    s.add_argument("--end", type=int, default=0)
    s.add_argument("--exclude", default="",
                   help="space-separated exclude terms (kind=not)")
    s.add_argument("--pre", type=int, default=0)
    s.add_argument("--post", type=int, default=0)
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-join")
    s.add_argument("--index", required=True)
    s.add_argument("--from-query", required=True)
    s.add_argument("--from-field", required=True)
    s.add_argument("--to-field", required=True)
    s.add_argument("--score-mode", default="max",
                   choices=["none", "max", "min", "total", "avg"])
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("block-join")
    s.add_argument("--index", required=True)
    s.add_argument("--direction", default="parents",
                   choices=["parents", "children"])
    s.add_argument("--query", required=True,
                   help="child query (parents) / parent query (children)")
    s.add_argument("--parent-filter", required=True)
    s.add_argument("--block-field", required=True)
    s.add_argument("--score-mode", default="max",
                   choices=["none", "max", "min", "total", "avg"])
    s.add_argument("--no-score", action="store_true",
                   help="children direction: doScores=false (constant 1.0)")
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("search-sorted-by")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--sort", required=True,
                   help='JSON list, e.g. \'[["doc_len", "desc"], ["warc_ts", "asc"]]\'')
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("classify")
    s.add_argument("--index", required=True)
    s.add_argument("--text", required=True)
    s.add_argument("--class-field", required=True)
    s.add_argument("--knn", type=int, default=0,
                   help="0 = naive Bayes; N > 0 = KNN vote over top-N MLT hits")
    s.add_argument("--collection", default="default")
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("term-vector")
    s.add_argument("--index", required=True)
    s.add_argument("--url", required=True)
    s.add_argument("--field", default=None)
    s.add_argument("--collection", default="default")
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("facets-taxonomy")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--levels", required=True,
                   help="comma-separated level fields, root first "
                        "(e.g. lang,source)")
    s.add_argument("--top-n", type=int, default=None)
    s.add_argument("--collection", default="default")
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("drill-sideways")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--dims", required=True,
                   help='JSON object, e.g. \'{"lang": "de", "source": ["a", "b"]}\'')
    s.add_argument("--collection", default="default")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("rescore")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--rescore-query", required=True)
    s.add_argument("--collection", default="default")
    s.add_argument("--window", type=int, default=None)
    s.add_argument("--weight", type=float, default=1.0)
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("hybrid")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--embeddings", required=True,
                   help="dir containing embeddings.parquet (vec_id = doc_id)")
    s.add_argument("--qvec-id", type=int, default=0)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--k-leg", type=int, default=20)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("serve")
    s.add_argument("--index", required=True)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s = sub.add_parser("stats")
    s.add_argument("--index", required=True)
    s.add_argument("--collection", default="default")
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("check")
    s.add_argument("--index", required=True)
    s.add_argument("--generation", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser("replicate")
    s.add_argument("--index", required=True, help="source index root")
    s.add_argument("--dest", required=True, help="destination root (path or URL)")
    s.add_argument("--generation", type=int, default=None)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--fields", default="")
    s = sub.add_parser(
        "merge-indexes",
        description="Physically merge several independently built indexes "
        "into one new root (IndexWriter.addIndexes analogue) — no corpus "
        "re-read; duplicate live urls across sources are a loud error.",
    )
    s.add_argument("--indexes", required=True, nargs="+",
                   help="two or more source index roots")
    s.add_argument("--dest", required=True, help="destination root")
    s.add_argument("--num-partitions", type=int, default=None,
                   help="destination partition count (default: max source)")
    s.set_defaults(index=None, partitions=32, fields="")
    s = sub.add_parser(
        "repartition",
        description="Re-shard an index to a new partition count from its "
        "inverted data alone; the field list and old partition count come "
        "from the SOURCE manifest (no --fields/--partitions knobs).",
    )
    s.add_argument("--index", required=True, help="source index root")
    s.add_argument("--dest", required=True, help="destination root")
    s.add_argument("--new-partitions", type=int, required=True)
    s.set_defaults(partitions=32, fields="")  # for the shared _cfg(args)
    args = p.parse_args(argv)

    cfg = _cfg(args)
    if args.cmd == "build":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.build import build_index

        m = build_index(args.corpus, cfg)
        print(json.dumps({"generation": m.generation,
                          "docs": sum(r["n_docs"] for r in m.partitions)}))
    elif args.cmd == "delta":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.build import build_delta

        m = build_delta(args.corpus, cfg)
        print(json.dumps({"generation": m.generation,
                          "docs": sum(r["n_docs"] for r in m.partitions)}))
    elif args.cmd == "search":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        if (args.after_score is None) != (args.after_url is None):
            p.error("--after-score and --after-url must be given together")
        if args.after_score is not None:
            t = eng.search_after(
                args.query, args.after_score, args.after_url,
                collection=args.collection, limit=args.limit,
            )
        else:
            t = eng.search(args.query, collection=args.collection,
                           limit=args.limit, method=args.method)
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "compact":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.build import compact_index

        m = compact_index(cfg)
        print(json.dumps({"generation": m.generation, "compacted": True}))
    elif args.cmd == "clear":
        from lucene_plugin_ray.pipelines.build import clear_collection

        m = clear_collection(cfg, args.collection)
        print(json.dumps({"generation": m.generation, "cleared": args.collection}))
    elif args.cmd == "delete":
        import pyarrow as pa

        from lucene_plugin_ray.pipelines.build import delete_docs

        urls = args.urls.split(",")
        m = delete_docs(cfg, pa.table({"collection": [args.collection] * len(urls),
                                       "url": urls}))
        print(json.dumps({"generation": m.generation, "deleted": len(urls)}))
    elif args.cmd == "count":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        print(json.dumps(
            {"count": eng.count(args.query, collection=args.collection)}
        ))
    elif args.cmd == "facets":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.facets(args.query, args.field, collection=args.collection)
        for v, c in zip(t["value"].to_pylist(), t["count"].to_pylist()):
            print(json.dumps({"value": v, "count": c}))
    elif args.cmd == "suggest":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.suggest(args.term, collection=args.collection, k=args.k)
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "complete":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.complete(args.prefix, collection=args.collection, k=args.k)
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "complete-infix":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.complete_infix(
            args.fragment, collection=args.collection, k=args.k
        )
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "search-filtered":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_filtered(
            args.query, args.filter, collection=args.collection,
            limit=args.limit,
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "stats":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        for row in eng.index_stats(collection=args.collection).to_pylist():
            print(json.dumps(row))
    elif args.cmd == "search-surround":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_surround(
            args.query, collection=args.collection, limit=args.limit
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "search-diversified":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_diversified(
            args.query, args.key_field, max_per_key=args.max_per_key,
            collection=args.collection, limit=args.limit,
        )
        for url, score, key in zip(
            t["url"].to_pylist(), t["score"].to_pylist(), t["key"].to_pylist()
        ):
            print(json.dumps({"url": url, "score": round(score, 6),
                              "key": key}))
    elif args.cmd == "search-common":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_common(
            args.query, max_term_frequency=args.max_term_frequency,
            collection=args.collection, limit=args.limit,
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "search-boosting":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_boosting(
            args.positive, args.negative, demote=args.demote,
            collection=args.collection, limit=args.limit,
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "search-expression":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_expression(
            args.query, args.expression, bindings=json.loads(args.bindings),
            collection=args.collection, limit=args.limit,
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "span":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        # kind-inapplicable flags are LOUD errors, never silently dropped
        # (the repartition-CLI lesson): each kind owns its parameter set
        def _forbid(kind: str, **flags):
            bad = [f"--{n.replace('_', '-')}" for n, v in flags.items() if v]
            if bad:
                raise SystemExit(
                    f"span --kind {kind} does not take {' / '.join(bad)}"
                )

        eng = SearchEngine(args.index, cfg=cfg)
        terms = args.terms.split()
        if args.kind == "near":
            _forbid("near", end=args.end, exclude=args.exclude,
                    pre=args.pre, post=args.post)
            t = eng.span_near(
                terms, slop=args.slop, in_order=not args.unordered,
                collection=args.collection, limit=args.limit,
            )
        elif args.kind == "first":
            _forbid("first", slop=args.slop, unordered=args.unordered,
                    exclude=args.exclude, pre=args.pre, post=args.post)
            if len(terms) != 1:
                raise SystemExit("span first takes exactly one --terms token")
            if args.end < 1:
                raise SystemExit("span first requires --end >= 1")
            t = eng.span_first(
                terms[0], args.end, collection=args.collection,
                limit=args.limit,
            )
        else:
            _forbid("not", slop=args.slop, unordered=args.unordered,
                    end=args.end)
            if len(terms) != 1:
                raise SystemExit("span not takes exactly one --terms token")
            if not args.exclude.strip():
                raise SystemExit("span not requires --exclude")
            t = eng.span_not(
                terms[0], args.exclude.split(), pre=args.pre, post=args.post,
                collection=args.collection, limit=args.limit,
            )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "search-join":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_join(
            args.from_query, args.from_field, args.to_field,
            score_mode=args.score_mode, collection=args.collection,
            limit=args.limit,
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "block-join":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        if args.direction == "parents":
            t = eng.block_join_parents(
                args.query, args.parent_filter, args.block_field,
                score_mode=args.score_mode, collection=args.collection,
                limit=args.limit,
            )
        else:
            t = eng.block_join_children(
                args.query, args.parent_filter, args.block_field,
                score=not args.no_score, collection=args.collection,
                limit=args.limit,
            )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "search-sorted-by":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.search_sorted_by(
            args.query, [tuple(p) for p in json.loads(args.sort)],
            collection=args.collection, limit=args.limit,
        )
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "classify":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        if args.knn > 0:
            t = eng.classify_knn(
                args.text, args.class_field, collection=args.collection,
                k=args.knn,
            )
        else:
            t = eng.classify(
                args.text, args.class_field, collection=args.collection
            )
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "term-vector":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.term_vector(
            args.url, field=args.field, collection=args.collection
        )
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "facets-taxonomy":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.facets_taxonomy(
            args.query,
            [f for f in args.levels.split(",") if f],
            collection=args.collection,
            top_n=args.top_n,
        )
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "drill-sideways":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        hits, counts = eng.drill_sideways(
            args.query, json.loads(args.dims), collection=args.collection,
            limit=args.limit,
        )
        for url, score in zip(hits["url"].to_pylist(), hits["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
        for f in sorted(counts):
            t = counts[f]
            for v, c in zip(t["value"].to_pylist(), t["count"].to_pylist()):
                print(json.dumps({"dim": f, "value": v, "count": c}))
    elif args.cmd == "rescore":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = eng.rescore(
            args.query, args.rescore_query, collection=args.collection,
            window_size=args.window, weight=args.weight, limit=args.limit,
        )
        for url, score in zip(t["url"].to_pylist(), t["score"].to_pylist()):
            print(json.dumps({"url": url, "score": round(score, 6)}))
    elif args.cmd == "hybrid":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.hybrid import hybrid_search
        from lucene_plugin_ray.pipelines.query import SearchEngine

        eng = SearchEngine(args.index, cfg=cfg)
        t = hybrid_search(eng, args.embeddings, args.query,
                          qvec_id=args.qvec_id, k=args.k, k_leg=args.k_leg)
        for row in t.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "check":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.check import check_index

        t = check_index(cfg.index_root, generation=args.generation)
        bad = 0
        for row in t.to_pylist():
            print(json.dumps(row))
            bad += 0 if row["ok"] else 1
        return 0 if bad == 0 else 1
    elif args.cmd == "merge-indexes":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.repartition import merge_indexes

        m = merge_indexes(args.indexes, args.dest,
                          num_partitions=args.num_partitions)
        print(json.dumps({
            "dest": args.dest,
            "num_partitions": m.num_partitions,
            "fields": m.fields,
            "docs": sum(r["n_docs"] for r in m.partitions),
            "segments": len(m.partitions),
        }))
    elif args.cmd == "repartition":
        _ensure_ray()
        from lucene_plugin_ray.pipelines.repartition import repartition_index

        m = repartition_index(cfg.index_root, args.dest, args.new_partitions)
        print(json.dumps({
            "dest": args.dest,
            "new_partitions": m.num_partitions,
            "docs": sum(r["n_docs"] for r in m.partitions),
            "segments": len(m.partitions),
        }))
    elif args.cmd == "replicate":
        _ensure_ray()
        import pyarrow.compute as pc

        from lucene_plugin_ray.pipelines.replicate import replicate_index

        t = replicate_index(
            cfg.index_root, args.dest, generation=args.generation
        )
        print(json.dumps({
            "artifacts": t.num_rows,
            "copied": t.num_rows - pc.sum(pc.cast(t["skipped"], "int64")).as_py(),
            "skipped": pc.sum(pc.cast(t["skipped"], "int64")).as_py(),
            "bytes_copied": pc.sum(t["bytes_copied"]).as_py(),
            "dest": args.dest,
        }))
    elif args.cmd == "serve":
        _ensure_ray()
        from lucene_plugin_ray.server import LuceneHttpService

        service = LuceneHttpService(cfg, host=args.host, port=args.port)
        print(json.dumps({"serving": service.url}), flush=True)
        try:
            service._httpd.serve_forever()
        except KeyboardInterrupt:
            service.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
