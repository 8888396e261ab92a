"""Two-node local-cluster smoke (VERDICT-r4 item 4).

Everything else in this repo is single-`ray.init(address="local")`
evidence.  This script starts a REAL two-node Ray cluster on this host
(`ray start --head` + a second `ray start --address=` worker process, each
with its own raylet/object store), runs the full build → sharded search →
compact flow over a shared filesystem root, and asserts the index content
digest + query results are identical to a single-node run — flushing any
hidden node-local-path or driver-locality assumption before a real
multi-node deploy.

Run:  python scripts/two_node_smoke.py          (from the repo root)
Takes ~2 min.  Leaves no cluster behind (ray stop in a finally).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 6399  # off the default 6379 to avoid colliding with stray clusters

DRIVER = r'''
import hashlib, json, os, shutil, sys
import ray

mode = sys.argv[1]          # "cluster" | "local"
root = sys.argv[2]
if mode == "cluster":
    ray.init(address="127.0.0.1:%d", include_dashboard=False,
             logging_level="ERROR")
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == 2, f"expected 2 alive nodes, got {len(nodes)}"
else:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False

from lucene_plugin_ray import IndexConfig, build_index, SearchEngine
from lucene_plugin_ray.pipelines.build import compact_index
from lucene_plugin_ray.pipelines.fixtures import make_pages
from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

shutil.rmtree(root, ignore_errors=True)
cfg = IndexConfig(index_root=root, num_partitions=8)
manifest = build_index(make_pages(3000, seed=11), cfg)
digest_src = ",".join(sorted(
    f"{r['collection']}:{r['partition']}:{r['input_digest']}"
    for r in manifest.partitions))
digest = hashlib.sha256(digest_src.encode()).hexdigest()[:16]

eng = SearchEngine(root, cfg=cfg)
qs = ["pagehit", "pagehit AND w00010", "w00010 OR w00020",
      "dupmarker1", "oldmarker1", "pagehi*"]
res = {q: [(r["url"], round(r["score"], 9))
           for r in eng.search(q, limit=10).to_pylist()] for q in qs}

# sharded read path (long-lived shard actors — placed on BOTH nodes in
# cluster mode)
import pyarrow as pa
svc = ShardedSearcherService(root, cfg=cfg)
qt = pa.table({"qid": list(range(len(qs))), "query": qs,
               "k": [10] * len(qs)})
sb = svc.search_batch(qt)
sharded = {}
for r in sb.to_pylist():
    sharded.setdefault(qs[r["qid"]], []).append(
        (r["url"], round(r["score"], 9)))
for q in qs:
    assert sharded.get(q, []) == res[q], f"sharded != engine for {q!r}"

# the shard fleet must actually SPREAD across both nodes (the service
# requests scheduling_strategy="SPREAD")
actor_nodes = len(set(ray.get([a.node_id.remote() for a in svc.actors])))
if mode == "cluster":
    assert actor_nodes == 2, f"shard actors on {actor_nodes} node(s)"

# compact (task-pool merge waves) then re-query: same answers
compact_index(cfg)
eng2 = SearchEngine(root, cfg=cfg)
res2 = {q: [(r["url"], round(r["score"], 9))
            for r in eng2.search(q, limit=10).to_pylist()] for q in qs}
assert res2 == res, "post-compact results differ"

print(json.dumps({"digest": digest, "results_sha": hashlib.sha256(
    json.dumps(res, sort_keys=True).encode()).hexdigest()[:16],
    "mode": mode, "shard_actor_nodes": actor_nodes}))
ray.shutdown()
''' % PORT


def _run(mode: str, root: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)  # the script picks its own address
    out = subprocess.run(
        [sys.executable, "-c", DRIVER, mode, root],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        print(out.stdout[-4000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"{mode} driver failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    subprocess.run(["ray", "stop", "--force"], env=env, capture_output=True)
    try:
        subprocess.run(
            ["ray", "start", "--head", f"--port={PORT}", "--num-cpus=8",
             "--include-dashboard=false", "--disable-usage-stats"],
            env=env, check=True, capture_output=True, text=True,
        )
        # a second `ray start` on the same host registers a SECOND node
        # (own raylet + plasma store) — the closest a sandbox gets to
        # multi-node: cross-node object transfer and scheduling are real,
        # only the network hop is loopback
        subprocess.run(
            ["ray", "start", f"--address=127.0.0.1:{PORT}", "--num-cpus=8",
             "--disable-usage-stats"],
            env=env, check=True, capture_output=True, text=True,
        )
        time.sleep(3)
        cluster = _run("cluster", "/tmp/lpr_2node_idx")
    finally:
        subprocess.run(["ray", "stop", "--force"], env=env,
                       capture_output=True)
    local = _run("local", "/tmp/lpr_1node_idx")
    ok = (cluster["digest"] == local["digest"]
          and cluster["results_sha"] == local["results_sha"])
    print(json.dumps({"two_node": cluster, "single_node": local,
                      "identical": ok}))
    shutil.rmtree("/tmp/lpr_2node_idx", ignore_errors=True)
    shutil.rmtree("/tmp/lpr_1node_idx", ignore_errors=True)
    if not ok:
        raise SystemExit("two-node digest/results mismatch")


if __name__ == "__main__":
    main()
