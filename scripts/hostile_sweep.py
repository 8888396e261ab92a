"""Hostile-corpus conformance sweep over EVERY ``queries()`` entry.

Builds a /tmp scale-factor directory that is the sf0.001 testdata PLUS
adversarial rows appended to ``documents`` / ``embeddings`` / ``events``
(empty text, stopword-only, punctuation-only, non-Latin scripts, emoji,
255-char tokens, megadocs, zero vectors, duplicate vectors, duplicate
(user, ts) events, malformed props JSON, epoch timestamps) — the exact bug
class round-2 ADVICE found (span_windows_batch IndexError when the LAST doc
of a batch has zero surviving tokens).  Hostile docs are placed at the END
of the table so last-row edge cases are exercised.

Runs every entry against the hostile dir; for entries with an
``oracle_sql()`` twin it also runs the DuckDB oracle over the SAME dir and
compares rows + sorted values (the driver's hash compare, reimplemented as a
tolerant column-wise equality so a divergence prints WHERE it differs).

Usage:  python scripts/hostile_sweep.py [--only entry1,entry2] [--skip-oracle]
Exit status 1 if any entry crashed or any oracle diverged.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time
import traceback

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.001"
DST = "/tmp/hostile_sf"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# --------------------------------------------------------------------------
# hostile rows
# --------------------------------------------------------------------------

HOSTILE_TEXTS = [
    # (text, lang, source)
    ("", "en", "src0"),                                  # empty
    ("   \t\n  ", "en", "src1"),                          # whitespace only
    ("the and of to a in is it", "en", "src2"),           # stopwords only
    ("!!! ??? ... ---", "en", "src3"),                    # punctuation only
    ("中文文本测试", "zh", "src4"),  # CJK (no [a-z0-9] runs)
    ("русский текст", "de", "src5"),  # Cyrillic
    ("\U0001f600 \U0001f680 ❤️", "fr", "src6"),  # emoji
    ("a", "en", "src7"),                                   # single char
    ("x" * 300, "en", "src8"),                             # one 300-char token (>255 cap)
    ("word " * 20000, "en", "src9"),                       # megadoc, one repeated token
    ("The QUICK brown FOX 123 jumps", "en", "src10"),      # mixed case + digits
    ("café naïve Über straße", "de", "src11"),  # accents / sharp s
    ("mixed 中文 and english words here", "en", "src12"),   # mixed script
    ("dup dup dup shared duplicate body text", "en", "src13"),      # dup pair A
    ("dup dup dup shared duplicate body text", "en", "src14"),      # dup pair B (exact)
    ("dup dup dup shared duplicate body texts", "en", "src15"),     # near-dup
    ("tab\tseparated\nnewline\rcarriage", "en", "src16"),
    ("trailing space ", "en", "src17"),
    ("0 00 000 0000 numbers only 1 22 333", "en", "src18"),
    ("the", "en", "src19"),                                # single stopword
    # final rows deliberately zero-surviving-token so LAST-doc batch edges hit
    ("", "es", "src0"),
    ("the of and", "en", "src1"),
]


def build_hostile_dir(dst: str = DST) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src_tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            base = int(max(src_tbl["doc_id"].to_pylist())) + 1
            rows = {
                "doc_id": [], "text": [], "lang": [], "source": [], "n_chars": [],
            }
            for i, (txt, lang, source) in enumerate(HOSTILE_TEXTS):
                rows["doc_id"].append(base + i)
                rows["text"].append(txt)
                rows["lang"].append(lang)
                rows["source"].append(source)
                rows["n_chars"].append(len(txt))
            extra = pa.table(rows).cast(src_tbl.schema)
            out = pa.concat_tables([src_tbl, extra])
        elif t == "embeddings":
            base = int(max(src_tbl["vec_id"].to_pylist())) + 1
            dim = len(src_tbl["embedding"][0])
            first = np.asarray(src_tbl["embedding"][0].as_py(), dtype=np.float32)
            vecs = [
                np.zeros(dim, dtype=np.float32),                 # zero vector
                first.copy(),                                     # exact dup of row 0
                first.copy(),                                     # second exact dup
                first + np.float32(1e-7),                         # near-dup
                np.full(dim, 1e-30, dtype=np.float32),            # tiny magnitude
                np.full(dim, 1.0, dtype=np.float32),              # constant vector
                -first,                                           # antipode
            ]
            extra = pa.table(
                {
                    "vec_id": pa.array(range(base, base + len(vecs)), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs],
                                          type=src_tbl.schema.field("embedding").type),
                    "label": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int32()),
                }
            ).cast(src_tbl.schema)
            out = pa.concat_tables([src_tbl, extra])
        elif t == "events":
            base = int(max(src_tbl["event_id"].to_pylist())) + 1
            lone_user = int(max(src_tbl["user_id"].to_pylist())) + 1
            some_user = int(src_tbl["user_id"][0].as_py())
            some_ts = src_tbl["ts"][0].as_py()
            etypes = [s.as_py() for s in src_tbl["event_type"].unique()]
            import datetime as _dt
            epoch = _dt.datetime(1970, 1, 1)
            rows = [
                # duplicate (user, ts) pair — two types, same instant
                (base + 0, some_ts, some_user, etypes[0], 0.0, ""),
                (base + 1, some_ts, some_user, etypes[-1], -5.25, "{not json"),
                # single-event user at epoch, huge value
                (base + 2, epoch, lone_user, etypes[0], 1e12, "{}"),
            ]
            extra = pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                    "value": pa.array([r[4] for r in rows], pa.float64()),
                    "props": pa.array([r[5] for r in rows], pa.string()),
                }
            ).cast(src_tbl.schema)
            out = pa.concat_tables([src_tbl, extra])
        else:
            out = src_tbl
        pq.write_table(out, f"{dst}/{t}.parquet")
    return dst


# --------------------------------------------------------------------------
# oracle comparison (driver-style: sort columns by name, sort rows, compare)
# --------------------------------------------------------------------------

def _canon(tbl) -> "object":
    import pandas as pd

    if isinstance(tbl, pa.Table):
        df = tbl.to_pandas()
    elif hasattr(tbl, "to_pandas"):
        df = tbl.to_pandas()
    else:
        df = tbl
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(ray_tbl, oracle_tbl) -> str | None:
    """None if equal; otherwise a short description of the divergence."""
    a, b = _canon(ray_tbl), _canon(oracle_tbl)
    if list(a.columns) != list(b.columns):
        return f"schema {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    import pandas as pd

    for col in a.columns:
        av, bv = a[col], b[col]
        an, bn = av.isna().to_numpy(), bv.isna().to_numpy()
        if not (an == bn).all():
            return f"col {col}: null placement differs"
        x, y = av[~an].to_numpy(), bv[~bn].to_numpy()
        if len(x) == 0:
            continue
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            ok = np.allclose(x.astype(np.float64), y.astype(np.float64),
                             rtol=0, atol=1e-9, equal_nan=True)
            bad = (
                np.nonzero(~np.isclose(x.astype(np.float64), y.astype(np.float64),
                                       rtol=0, atol=1e-9))[0][:3]
                if not ok else []
            )
        else:
            eq = x == y
            ok = bool(np.asarray(eq).all())
            bad = np.nonzero(~np.asarray(eq))[0][:3] if not ok else []
        if not ok:
            return f"col {col} differs (first non-null rows {list(bad)})"
    return None


# entries whose DOCUMENTED contract is a loud rejection on this corpus
# (domain guards, not crashes): message substring → why it's expected
EXPECTED_LOUD = {
    "value_quantiles_sketch": "requires non-negative values",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    sf_dir = build_hostile_dir()
    print(f"hostile dir: {sf_dir}")

    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    oracles = {} if args.skip_oracle else mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    import duckdb

    failures: list[str] = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_arrow_refs"):  # ray Dataset
                res = pa.concat_tables(
                    [b for b in res.iter_batches(batch_format="pyarrow")]
                ) if res.count() else None
            status = "ok"
        except Exception as e:  # noqa: BLE001
            expected = EXPECTED_LOUD.get(name)
            if expected and expected in str(e):
                print(f"[loud] {name} ({time.time()-t0:.1f}s): documented rejection: {expected!r}")
                continue
            failures.append(f"{name}: CRASH {type(e).__name__}: {e}")
            print(f"[CRASH] {name} ({time.time()-t0:.1f}s): {type(e).__name__}: {e}")
            traceback.print_exc(limit=6)
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"[ok  ] {name} ({dt:.1f}s) rows={getattr(res, 'num_rows', 'n/a')} (no oracle)")
            continue
        try:
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                )
            otbl = con.execute(sql).fetch_arrow_table()
            con.close()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: ORACLE CRASH {type(e).__name__}: {e}")
            print(f"[ocr ] {name}: oracle crashed: {e}")
            continue
        diff = compare(res, otbl)
        if diff is None:
            print(f"[ok+h] {name} ({dt:.1f}s) rows={res.num_rows}")
        else:
            failures.append(f"{name}: MISMATCH {diff}")
            print(f"[DIFF] {name} ({dt:.1f}s): {diff}")

    print()
    print(f"{len(failures)} failures")
    for f in failures:
        print(" -", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
