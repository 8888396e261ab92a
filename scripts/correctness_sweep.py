#!/usr/bin/env python
"""Full-set correctness sweep: run EVERY ``queries()`` entry against its
``oracle_sql()`` DuckDB twin, the same rows + schema + value-hash compare
the round driver performs — but over ALL entries, not a 50-entry rotation
(VERDICT r03 "Next round" item 1).

Compare protocol (mirrors the driver's):
  * both sides converted to pandas, columns sorted by name,
  * rows sorted by every column (stringified key for mixed/list cells),
  * floats rounded to 9 decimals, then the whole frame serialised to CSV
    and sha256-hashed — ``hash_match`` is equality of those digests.
Entries with no ``oracle_sql()`` twin are recorded rows-only with the
pytest referee file(s) that pin their semantics.

Usage:  python scripts/correctness_sweep.py [--sf /root/testdata/sf0.01]
                                            [--out CORRECTNESS_SWEEP.json]
Writes one JSON object keyed by entry name and prints a summary line.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# pytest files that pin the semantics of the oracle-less entries
REFEREES = {
    "dedup_minhash": "tests/test_minhash.py, tests/test_entry.py",
    "simhash": "tests/test_minhash.py, tests/test_entry.py",
    "simhash_pairs": "tests/test_minhash.py",
    "ann_ivf": "tests/test_entry.py (recall>=0.5 vs ann_topk)",
    "ann_lsh": "tests/test_entry.py (recall + exact-cosine parity)",
    "ann_pq": "tests/test_entry.py (recall vs ann_topk)",
    "bpe_fit": "tests/test_curation_ops.py (from-scratch referee)",
    "bpe_encode": "tests/test_curation_ops.py",
    "embedding_cluster": "tests/test_kmeans.py",
    "semantic_dedup": "tests/test_kmeans.py",
    "knn_graph_lsh": "tests/test_knn_graph.py (recall referee)",
    "quality_classifier": "tests/test_curation_ops.py (accuracy referee)",
    "minhash_clusters": "tests/test_round3_ops.py",
    "distinct_users_hll": "tests/test_round3_ops.py (error-bound vs exact)",
    "decontaminate_bloom": "tests/test_curation_ops.py (exact-twin equivalence)",
}


def _canon(obj) -> pd.DataFrame:
    df = obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists / bytes / mixed → stable string form for sorting+hashing
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                else (json.dumps(list(v)) if isinstance(v, (list, tuple, np.ndarray)) else v)
            )
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _digest(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False, float_format="%.9f").encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_SWEEP.json")
    ap.add_argument("--only", default=None, help="comma-list of entries")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as E
    qs, sqls = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf}/{t}.parquet')")

    names = list(qs) if not args.only else args.only.split(",")
    report: dict[str, dict] = {}
    t0 = time.time()
    for i, name in enumerate(names, 1):
        row: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            got = _canon(qs[name](args.sf))
            row["spark_rows"] = int(len(got))
            if name in sqls:
                exp = _canon(con.sql(sqls[name]).arrow())
                row["oracle_rows"] = int(len(exp))
                row["rows_match"] = len(got) == len(exp)
                row["schema_match"] = list(got.columns) == list(exp.columns)
                row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                     and _digest(got) == _digest(exp))
            else:
                row["err"] = "no_oracle"
                row["referee"] = REFEREES.get(name, "tests/")
        except Exception:
            row["err"] = traceback.format_exc(limit=3).splitlines()[-1][:300]
        report[name] = row
        flag = ("OK" if row["hash_match"] else
                "rows-only" if row["err"] == "no_oracle" else
                "FAIL")
        print(f"[{i:3}/{len(names)}] {name:28s} {flag:9s} "
              f"rows={row['spark_rows']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

    oracled = [r for r in report.values() if r["err"] != "no_oracle"]
    green = [r for r in oracled if r["hash_match"]]
    bad = {k: r for k, r in report.items()
           if r["err"] not in (None, "no_oracle") or
           (r["err"] is None and not r["hash_match"])}
    print(f"\nsweep: {len(green)}/{len(oracled)} oracle-bearing entries "
          f"hash-green, {len(report) - len(oracled)} rows-only, "
          f"{len(bad)} failures, {time.time() - t0:.1f}s → {args.out}")
    if bad:
        for k, r in bad.items():
            print(f"  FAIL {k}: {r['err']}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
