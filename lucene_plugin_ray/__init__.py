"""lucene_plugin_ray — a Ray-Data-native inverted-index build + BM25 query engine.

From-scratch re-expression of the query/data-processing capabilities of
baratine/lucene-plugin (reference at /root/reference) as distributed batch
pipelines of ``ray.data.Dataset`` transformations over zero-copy Arrow batches.

Public API (SURVEY.md §2.11):

    from lucene_plugin_ray import IndexConfig, build_index, SearchEngine

    cfg = IndexConfig(index_root="/tmp/idx", num_partitions=8)
    manifest = build_index(ds, cfg)               # ds: ray.data.Dataset of pages
    eng = SearchEngine(cfg.index_root)
    hits = eng.search("lamb", collection="default", limit=10)

The engine is NOT a port: the reference is a single-node online Lucene service;
this is a columnar batch engine.  See SURVEY.md for the full mapping.
"""

from lucene_plugin_ray.config import IndexConfig

__all__ = [
    "IndexConfig", "build_index", "build_delta", "SearchEngine",
    "sharded_search", "ShardedSearcherService", "MultiIndexSearcherService",
    "AutoExtract",
    "LuceneFacade", "AsyncLuceneFacade", "LuceneEntry", "LuceneException",
    "LuceneHttpService", "LuceneHttpClient",
    "replicate_index", "repartition_index", "merge_indexes", "check_index",
    "compile_expression", "parse_surround", "make_span_clause",
]
__version__ = "0.3.0"


def __getattr__(name):  # lazy so `import lucene_plugin_ray` stays light
    if name in ("build_index", "build_delta"):
        from lucene_plugin_ray.pipelines import build

        return getattr(build, name)
    if name == "SearchEngine":
        from lucene_plugin_ray.pipelines.query import SearchEngine

        return SearchEngine
    if name in ("sharded_search", "ShardedSearcherService",
                "MultiIndexSearcherService"):
        from lucene_plugin_ray.pipelines import sharded

        return getattr(sharded, name)
    if name == "AutoExtract":
        from lucene_plugin_ray.stages.extract import AutoExtract

        return AutoExtract
    if name in ("LuceneFacade", "AsyncLuceneFacade", "LuceneEntry", "LuceneException"):
        from lucene_plugin_ray import facade

        return getattr(facade, name)
    if name in ("LuceneHttpService", "LuceneHttpClient"):
        from lucene_plugin_ray import server

        return getattr(server, name)
    if name in ("repartition_index", "merge_indexes"):
        from lucene_plugin_ray.pipelines import repartition

        return getattr(repartition, name)
    if name == "replicate_index":
        from lucene_plugin_ray.pipelines.replicate import replicate_index

        return replicate_index
    if name == "check_index":
        from lucene_plugin_ray.pipelines.check import check_index

        return check_index
    if name == "compile_expression":
        from lucene_plugin_ray.functions.expressions import compile_expression

        return compile_expression
    if name == "parse_surround":
        from lucene_plugin_ray.functions.surround import parse_surround

        return parse_surround
    if name == "make_span_clause":
        from lucene_plugin_ray.pipelines.query import make_span_clause

        return make_span_clause
    raise AttributeError(name)
