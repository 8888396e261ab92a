"""Heavy-ops third scale point (VERDICT-r4 item 8).

The dedup/ANN/events families' cost is corpus-shaped (rows through the
op), not index-shaped, so the 10×-replica INDEX bench point says nothing
about them.  This script synthesizes a deterministic "sf1" table set at
10× sf0.1 row counts (documents 5k→50k, events 100k→1M, embeddings
2k→20k; ids shifted per replica, doc texts salted with a per-replica
token so the dedup ops see a realistic dup-rate rather than 90%
replicas), runs each family member at sf0.1 and sf1 (min-of-2 wall
times), and writes BENCH_SWEEP_SF1.json with the per-op time ratio.
Pass/fail: no op's ratio may exceed SUPERLINEAR_LIMIT (10× data; ratio
≳ 15 means super-linear growth — the thing the sweep exists to catch;
sub-10 ratios are fixed-cost amortization).

Run:  python scripts/heavy_sweep_sf1.py        (from the repo root; ~5 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "PYTHONPATH",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)  # Ray workers need the package importable too

SUPERLINEAR_LIMIT = 15.0
SF01 = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = "/tmp/lpr_sf1"
REPLICAS = 10


def synthesize_sf1() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    shutil.rmtree(SF1, ignore_errors=True)
    os.makedirs(SF1)

    docs = pq.read_table(f"{SF01}/documents.parquet")
    n = docs.num_rows
    parts = []
    for r in range(REPLICAS):
        t = docs.set_column(
            docs.schema.get_field_index("doc_id"), "doc_id",
            pc.add(docs["doc_id"], r * n),
        )
        if r:  # salt replica texts so they're near- but not exact dups
            t = t.set_column(
                t.schema.get_field_index("text"), "text",
                pc.binary_join_element_wise(
                    t["text"].combine_chunks().cast(pa.string()),
                    pa.array([f"replica{r}"] * n, pa.string()), " ",
                ),
            )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{SF1}/documents.parquet")

    ev = pq.read_table(f"{SF01}/events.parquet")
    m = ev.num_rows
    n_users = int(pc.max(ev["user_id"]).as_py()) + 1
    parts = []
    for r in range(REPLICAS):
        t = ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pc.add(ev["event_id"], r * m),
        )
        # distinct user populations per replica: group COUNT scales with
        # data (the expensive axis for sessionize/rolling/hopping)
        t = t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pc.add(t["user_id"], r * n_users),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{SF1}/events.parquet")

    emb = pq.read_table(f"{SF01}/embeddings.parquet")
    k = emb.num_rows
    parts = []
    for r in range(REPLICAS):
        parts.append(
            emb.set_column(
                emb.schema.get_field_index("vec_id"), "vec_id",
                pc.add(emb["vec_id"], r * k),
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{SF1}/embeddings.parquet")

    # relational tables some ops join against ride along unreplicated
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        p = f"{SF01}/{name}.parquet"
        if os.path.exists(p):
            shutil.copy(p, f"{SF1}/{name}.parquet")


def main() -> None:
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    synthesize_sf1()

    from lucene_plugin_ray.pipelines import relational, training

    OPS = {
        "dedup_exact": lambda sf: training.dedup_exact(sf),
        "paragraph_dedup": lambda sf: training.paragraph_dedup(sf),
        "dedup_ngram_spans": lambda sf: training.dedup_ngram_spans(sf),
        "dedup_minhash": lambda sf: training.dedup_minhash(sf),
        "minhash_clusters": lambda sf: training.minhash_clusters(sf),
        "simhash_pairs": lambda sf: training.simhash_pairs(sf),
        "semantic_dedup": lambda sf: training.semantic_dedup(
            sf, n_clusters=8, n_iter=3),
        "embedding_dedup": lambda sf: training.embedding_dedup(sf),
        "ann_topk": lambda sf: training.ann_topk(sf),
        "ann_ivf": lambda sf: training.ann_ivf(sf),
        "ann_lsh": lambda sf: training.ann_lsh(sf),
        "ann_pq": lambda sf: training.ann_pq(sf),
        "knn_graph": lambda sf: training.knn_graph(sf),
        "events_sessionize": lambda sf: training.events_sessionize(sf),
        "events_rolling": lambda sf: training.events_rolling(sf),
        "events_hopping": lambda sf: training.events_hopping(sf),
        "events_latest": lambda sf: training.events_latest(sf),
        "events_asof": lambda sf: training.events_asof(sf),
        "events_band_join": lambda sf: training.events_band_join(sf),
        "user_funnel": lambda sf: relational.user_funnel(sf),
    }

    def timed(fn, sf) -> float:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            out = fn(sf)
            if hasattr(out, "iter_batches"):  # drain lazy datasets
                sum(1 for _ in out.iter_batches(batch_format="pyarrow"))
            d = time.monotonic() - t0
            best = d if best is None else min(best, d)
        return round(best, 3)

    rows = {}
    worst = (None, 0.0)
    for name, fn in OPS.items():
        t01 = timed(fn, SF01)
        t1 = timed(fn, SF1)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        rows[name] = {"sf0.1_s": t01, "sf1_s": t1, "ratio": ratio}
        if ratio and ratio > worst[1]:
            worst = (name, ratio)
        print(f"{name:22s} sf0.1 {t01:7.3f}s  sf1 {t1:7.3f}s  x{ratio}",
              flush=True)

    result = {
        "replicas": REPLICAS,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        "superlinear_limit": SUPERLINEAR_LIMIT,
        "worst": {"op": worst[0], "ratio": worst[1]},
        "ops": rows,
    }
    with open("BENCH_SWEEP_SF1.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"worst": result["worst"]}))
    ray.shutdown()
    bad = [n for n, r in rows.items()
           if r["ratio"] and r["ratio"] > SUPERLINEAR_LIMIT]
    if bad:
        raise SystemExit(f"super-linear ops: {bad}")


if __name__ == "__main__":
    main()
