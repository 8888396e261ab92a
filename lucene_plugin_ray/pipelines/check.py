"""Index integrity validation — the Lucene CheckIndex analogue
(org.apache.lucene.index.CheckIndex, the `-fix`-less read-only mode; the
reference ships Lucene 5.2.1 whose CheckIndex walks every segment's
postings/stored fields/norms and cross-checks the totals).

Ray-Data-first shape: one stateless task per manifest segment row (segments
are independent by construction — doc-disjoint (collection, partition,
generation) units), fanned out with ``ray.data.from_items → map_batches``.
Each task mmaps ONE segment and runs the full invariant suite below; the
driver then folds the per-segment rows and re-checks the cross-segment
aggregates recorded in each manifest.  Cost is one sequential read of every
segment — the same I/O shape as a compaction pass — and scales with
``concurrency`` exactly like the build.

Per-segment invariants (mirrors CheckIndex's term/postings/stored checks):
  meta    manifest row ↔ meta.json agreement (collection/generation/
          doc_base/n_docs), doc_base == partition · DOCID_STRIDE,
          n_docs ≤ DOCID_STRIDE
  docs    row count == n_docs; urls strictly increasing (the searchsorted
          contract every query path relies on); text_sha256 is 64-hex;
          dl_* ≥ 0
  terms   fields grouped + terms strictly increasing per field (the
          dictionary binary-search contract); df ≥ 1; offset regions
          monotone and inside their payload files
  postings ONE bulk varint decode of the whole segment (the merge path's
          codec): every delta ≥ 1 (docids strictly increasing per term),
          reconstructed local ids < n_docs, tf ≥ 1, Σdf == n_postings
  stats   per-field Σtf == meta sum_dl[field]; per-DOC Σtf == the stored
          dl_field column (bincount — the norms cross-check)
  positions (when present) every position delta ≥ 1 and the stream length
          == Σtf (the .prx alignment check)

Driver-side cross-checks: every manifest's ``collections`` block equals
``aggregate_collections`` of its own partition rows; tombstone parquets
load and carry the (collection, url) schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_plugin_ray.functions.docid import DOCID_STRIDE

CHECK_ROW_SCHEMA = pa.schema(
    [
        ("collection", pa.string()),
        ("partition", pa.int32()),
        ("generation", pa.int64()),
        ("path", pa.string()),
        ("n_docs", pa.int64()),
        ("n_terms", pa.int64()),
        ("n_postings", pa.int64()),
        ("ok", pa.bool_()),
        ("errors", pa.string()),  # '; '-joined, '' when ok
    ]
)


def _check_segment_row(row: dict) -> dict:
    """Validate ONE segment against its manifest row → CHECK_ROW_SCHEMA
    dict.  Never raises: any defect (including an unreadable segment)
    becomes an ``errors`` entry, so one corrupt partition cannot abort the
    sweep over the healthy ones."""
    errors: list[str] = []
    n_terms_seen = 0
    n_postings_seen = 0
    try:
        from lucene_plugin_ray.stages.merge import (
            _bulk_decode_positions,
            _bulk_decode_postings,
        )
        from lucene_plugin_ray.state.segment import SegmentReader

        r = SegmentReader(row["path"])
        # ---- meta ↔ manifest row agreement
        for key in ("collection", "generation", "doc_base", "n_docs"):
            if getattr(r, key) != row[key]:
                errors.append(
                    f"meta.{key}={getattr(r, key)!r} != manifest {row[key]!r}"
                )
        if r.doc_base != int(row["partition"]) * DOCID_STRIDE:
            errors.append(
                f"doc_base {r.doc_base} != partition·stride "
                f"{int(row['partition']) * DOCID_STRIDE}"
            )
        if r.n_docs > DOCID_STRIDE:
            errors.append(f"n_docs {r.n_docs} exceeds DOCID_STRIDE")
        # ---- docs table
        if len(r.urls) != r.n_docs:
            errors.append(f"docs rows {len(r.urls)} != n_docs {r.n_docs}")
        if len(r.urls) > 1 and not (r.urls[:-1] < r.urls[1:]).all():
            errors.append("urls not strictly increasing")
        shas = r.text_sha256
        if len(shas) and not all(
            isinstance(s, str) and len(s) == 64 for s in shas[: 10_000]
        ):
            errors.append("text_sha256 not 64-hex (first 10k sampled)")
        for f, dl in r.doc_len.items():
            if dl.size != r.n_docs:
                errors.append(f"dl_{f} rows {dl.size} != n_docs")
            elif dl.size and int(dl.min()) < 0:
                errors.append(f"dl_{f} has negative lengths")
        # ---- dictionary
        n_terms_seen = len(r._terms)
        if int(row["n_terms"]) != n_terms_seen:
            errors.append(
                f"n_terms {n_terms_seen} != manifest {row['n_terms']}"
            )
        for f, (s, e) in r._field_ranges.items():
            t = r._terms[s:e]
            if len(t) > 1 and not (t[:-1] < t[1:]).all():
                errors.append(f"terms of field {f!r} not strictly increasing")
        if n_terms_seen:
            df = r._df.astype(np.int64)
            if int(df.min()) < 1:
                errors.append("df < 1 in dictionary")
            for name, off, end, size in (
                ("doff", r._doff, r._doff_end, r.buf.size),
                ("toff", r._toff, r._toff_end, r.buf.size),
            ):
                if (off > end).any():
                    errors.append(f"{name} region start past end")
                elif end.size and int(end.max()) > size:
                    errors.append(f"{name} region beyond payload ({size} B)")
            # ---- postings: one bulk decode, all invariants vectorized
            total = int(df.sum())
            n_postings_seen = total
            if int(row["n_postings"]) != total:
                errors.append(
                    f"Σdf {total} != manifest n_postings {row['n_postings']}"
                )
            deltas, tfs = _bulk_decode_postings(r, df, total)
            if deltas.size != total or tfs.size != total:
                errors.append("postings stream shorter than Σdf")
            else:
                if total and int(deltas.min()) < 1:
                    errors.append("docid delta < 1 (not strictly increasing)")
                if total and int(tfs.min()) < 1:
                    errors.append("tf < 1")
                starts = np.concatenate([[0], np.cumsum(df)])
                cum = np.cumsum(deltas.astype(np.int64))
                term_base = (
                    np.concatenate(([0], cum[starts[1:-1] - 1]))
                    if n_terms_seen > 1
                    else np.zeros(min(n_terms_seen, 1), np.int64)
                )
                # deltas encode ABSOLUTE docids (delta[0] = doc_base +
                # local + 1) — subtract doc_base for the local-range check
                local = cum - np.repeat(term_base, df) - 1 - r.doc_base
                ids_ok = total == 0 or (
                    int(local.min()) >= 0 and int(local.max()) < r.n_docs
                )
                if not ids_ok:
                    errors.append("posting docid outside [0, n_docs)")
                # ---- per-field and per-doc tf totals (the norms check)
                tfs64 = tfs.astype(np.int64)
                for f, (s, e) in r._field_ranges.items():
                    lo, hi = int(starts[s]), int(starts[e])
                    want = int(r.sum_dl.get(f, 0))
                    got = int(tfs64[lo:hi].sum())
                    if got != want:
                        errors.append(
                            f"Σtf[{f}]={got} != meta sum_dl {want}"
                        )
                    dl = r.doc_len.get(f)
                    if dl is not None and ids_ok:
                        per_doc = np.bincount(
                            local[lo:hi], weights=tfs64[lo:hi],
                            minlength=r.n_docs,
                        ).astype(np.int64)
                        if not np.array_equal(per_doc, dl.astype(np.int64)):
                            errors.append(
                                f"per-doc Σtf != dl_{f} column"
                            )
                # ---- positions alignment
                if r.has_positions and r._poff.size:
                    pdel = _bulk_decode_positions(r, int(tfs64.sum()))
                    if pdel.size != int(tfs64.sum()):
                        errors.append(
                            f"positions stream {pdel.size} != Σtf "
                            f"{int(tfs64.sum())}"
                        )
                    elif pdel.size and int(pdel.min()) < 1:
                        errors.append("position delta < 1")
    except Exception as exc:  # noqa: BLE001 — a corrupt file IS the finding
        errors.append(f"unreadable segment: {type(exc).__name__}: {exc}")
    return {
        "collection": row["collection"],
        "partition": int(row["partition"]),
        "generation": int(row["generation"]),
        "path": row["path"],
        "n_docs": int(row["n_docs"]),
        "n_terms": int(n_terms_seen),
        "n_postings": int(n_postings_seen),
        "ok": not errors,
        "errors": "; ".join(errors),
    }


def _check_batch(batch: pa.Table) -> pa.Table:
    """map_batches task: validate each manifest row's segment (stateless —
    a plain task pool, no actor state to warm)."""
    rows = [_check_segment_row(r) for r in batch.to_pylist()]
    return pa.Table.from_pylist(rows, schema=CHECK_ROW_SCHEMA)


def check_index(
    index_root: str,
    generation: int | None = None,
    concurrency: int | None = None,
) -> pa.Table:
    """CheckIndex over the manifest chain at ``generation`` (default:
    latest) → one CHECK_ROW_SCHEMA row per segment plus driver-level rows
    (partition == -1) for manifest/tombstone defects.  Read-only; the
    result's ``ok`` column is the health verdict (``errors`` says why)."""
    from lucene_plugin_ray.state import storage
    from lucene_plugin_ray.state.manifest import (
        aggregate_collections,
        load_manifest_chain,
        load_tombstones,
    )

    chain = load_manifest_chain(index_root, generation)
    driver_rows: list[dict] = []
    seg_rows: list[dict] = []
    for m in chain:
        seg_rows.extend(m.partitions)
        errs: list[str] = []
        agg = aggregate_collections(m.partitions)
        if agg != m.collections:
            errs.append(
                f"manifest-{m.generation} collections block != "
                "aggregate of its partition rows"
            )
        if m.tombstone_path:
            try:
                t = load_tombstones(m.tombstone_path)
                if t is not None and set(t.column_names) != {
                    "collection",
                    "url",
                }:
                    errs.append(
                        f"tombstones gen-{m.generation}: bad schema "
                        f"{t.column_names}"
                    )
            except Exception as exc:  # noqa: BLE001
                errs.append(
                    f"tombstones gen-{m.generation} unreadable: {exc}"
                )
        if m.parent_generation is not None and not storage.exists(
            storage.join(index_root, f"manifest-{m.parent_generation}.json")
        ):
            errs.append(
                f"manifest-{m.generation} parent "
                f"{m.parent_generation} missing"
            )
        driver_rows.append(
            {
                "collection": "*",
                "partition": -1,
                "generation": int(m.generation),
                "path": storage.join(
                    index_root, f"manifest-{m.generation}.json"
                ),
                "n_docs": sum(int(r["n_docs"]) for r in m.partitions),
                "n_terms": sum(int(r["n_terms"]) for r in m.partitions),
                "n_postings": sum(int(r["n_postings"]) for r in m.partitions),
                "ok": not errs,
                "errors": "; ".join(errs),
            }
        )
    out_parts = [pa.Table.from_pylist(driver_rows, schema=CHECK_ROW_SCHEMA)]
    if seg_rows:
        ds = ray.data.from_items(seg_rows)
        kwargs = {"concurrency": concurrency} if concurrency else {}
        checked = ds.map_batches(
            _check_batch,
            batch_format="pyarrow",
            batch_size=1,  # one segment per task: I/O-bound, fan wide
            zero_copy_batch=True,
            **kwargs,
        )
        out_parts.extend(checked.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(
        [t.cast(CHECK_ROW_SCHEMA) for t in out_parts if t.num_rows]
        or [CHECK_ROW_SCHEMA.empty_table()]
    )
    return out.sort_by(
        [("generation", "ascending"), ("collection", "ascending"),
         ("partition", "ascending")]
    )
