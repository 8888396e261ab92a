"""CheckIndex analogue (pipelines/check.py): a healthy multi-generation
index passes every invariant; planted corruptions are detected per segment
without aborting the sweep; manifest-level tampering is flagged on the
driver rows (partition == -1)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.check import check_index
from lucene_plugin_ray.pipelines.fixtures import make_pages


@pytest.fixture()
def built(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        delete_docs,
    )

    root = str(tmp_path / "idx")
    cfg = IndexConfig(index_root=root, num_partitions=3,
                      field_columns=("foo",))
    pages = make_pages(120, seed=3, with_fields=True)
    build_index(pages, cfg)
    build_delta(make_pages(30, seed=4, with_fields=True), cfg)
    url = pages["url"][0].as_py()
    delete_docs(cfg, pa.table({"collection": ["default"], "url": [url]}))
    return root, cfg


def test_healthy_index_all_ok(built):
    root, _cfg = built
    t = check_index(root)
    assert t.num_rows > 3  # >= 3 manifests + segment rows
    bad = t.filter(pa.compute.invert(t["ok"]))
    assert bad.num_rows == 0, bad.to_pylist()
    seg = t.filter(pa.compute.greater_equal(t["partition"], 0))
    assert seg.num_rows >= 4  # 3 partitions gen0 + >=1 gen1
    assert all(e == "" for e in t["errors"].to_pylist())


def test_detects_truncated_postings(built):
    root, _cfg = built
    t = check_index(root)
    seg_paths = [
        r["path"] for r in t.to_pylist()
        if r["partition"] >= 0 and r["n_postings"] > 0
    ]
    victim = seg_paths[0]
    pb = os.path.join(victim, "postings.bin")
    size = os.path.getsize(pb)
    with open(pb, "r+b") as f:
        f.truncate(max(size // 2, 1))
    t2 = check_index(root)
    rows = {r["path"]: r for r in t2.to_pylist()}
    assert not rows[victim]["ok"]
    assert rows[victim]["errors"]
    # the sweep still validated every OTHER segment
    others = [r for p, r in rows.items() if p != victim and r["partition"] >= 0]
    assert others and all(r["ok"] for r in others)


def test_detects_meta_manifest_mismatch(built):
    root, _cfg = built
    t = check_index(root)
    victim = next(r["path"] for r in t.to_pylist() if r["partition"] >= 0)
    mp = os.path.join(victim, "meta.json")
    meta = json.load(open(mp))
    meta["manifest_row"]["n_docs"] += 1
    json.dump(meta, open(mp, "w"))
    t2 = check_index(root)
    row = next(r for r in t2.to_pylist() if r["path"] == victim)
    assert not row["ok"] and "n_docs" in row["errors"]


def test_detects_unsorted_docs_urls(built):
    root, _cfg = built
    t = check_index(root)
    victim = next(
        r["path"] for r in t.to_pylist()
        if r["partition"] >= 0 and r["n_docs"] >= 2
    )
    dp = os.path.join(victim, "docs.parquet")
    d = pq.read_table(dp)
    urls = d["url"].to_pylist()
    urls[0], urls[1] = urls[1], urls[0]
    d = d.set_column(d.schema.get_field_index("url"), "url",
                     pa.array(urls, pa.string()))
    pq.write_table(d, dp)
    t2 = check_index(root)
    row = next(r for r in t2.to_pylist() if r["path"] == victim)
    assert not row["ok"] and "urls not strictly increasing" in row["errors"]


def test_detects_manifest_collections_tamper(built):
    root, _cfg = built
    gens = sorted(
        int(f.split("-")[1].split(".")[0])
        for f in os.listdir(root) if f.startswith("manifest-")
    )
    mp = os.path.join(root, f"manifest-{gens[0]}.json")
    m = json.load(open(mp))
    coll = next(iter(m["collections"]))
    m["collections"][coll]["n_docs"] += 5
    json.dump(m, open(mp, "w"))
    t = check_index(root)
    drv = next(
        r for r in t.to_pylist()
        if r["partition"] == -1 and r["generation"] == gens[0]
    )
    assert not drv["ok"] and "collections block" in drv["errors"]


def test_cli_exit_codes(built):
    from lucene_plugin_ray.__main__ import main

    root, _cfg = built
    assert main(["check", "--index", root, "--partitions", "3",
                 "--fields", "foo"]) == 0
    victim_meta = None
    for d in os.listdir(root):
        seg = os.path.join(root, d)
        if os.path.isdir(seg) and os.path.exists(
            os.path.join(seg, "meta.json")
        ):
            victim_meta = os.path.join(seg, "meta.json")
            break
    if victim_meta is None:  # segments may nest one level deeper
        for dirpath, _dirs, files in os.walk(root):
            if "meta.json" in files:
                victim_meta = os.path.join(dirpath, "meta.json")
                break
    meta = json.load(open(victim_meta))
    meta["manifest_row"]["generation"] += 7
    json.dump(meta, open(victim_meta, "w"))
    assert main(["check", "--index", root, "--partitions", "3",
                 "--fields", "foo"]) == 1
