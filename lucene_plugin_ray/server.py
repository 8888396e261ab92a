"""HTTP serving surface over :class:`LuceneFacade` (SURVEY.md §2.11; the
last reference artifact: ``LuceneFacadeImpl.java:29-151`` ``@Path("/lucene")``
+ ``web/src/main/resources/public/lucene-client.js:24-125``).

Wire protocol (identical shapes to the reference):

* ``POST <base>/index-text`` — form body ``collection``, ``id``, ``text``
  → ``true``                                  (LuceneFacadeImpl.java:56-67)
* ``POST <base>/index-map``  — form body ``collection``, ``id`` + one pair
  per field → ``true``                        (LuceneFacadeImpl.java:70-81)
* ``POST <base>/index-file`` — form body ``collection``, ``path`` → ``true``
                                              (LuceneFacadeImpl.java:43-53)
* ``GET  <base>/search?collection=&query=&limit=`` → JSON array of
  ``{"_id", "_score", "_externalId"}`` — the Java field names
  ``lucene-client.js:104-106`` reads        (LuceneFacadeImpl.java:84-95)
* ``POST <base>/delete`` — form body ``collection``, ``id`` → ``true``
                                              (LuceneFacadeImpl.java:133-140)
* ``POST <base>/clear``  — form body ``collection`` → ``null``
                                              (LuceneFacadeImpl.java:143-151)

Validation failures (``LuceneException``) map to HTTP 400 with
``{"error": message}`` — the reference surfaces them as request errors too.

This is a SERVING adapter, not a data-plane component: one process, stdlib
``ThreadingHTTPServer``, a lock serializing facade access (the facade owns
a single writer buffer — the reference's writer inbox is equally serial per
index).  Searches flush pending writes first (read-your-writes), matching
the reference E2E tests' visible-after-index expectation.  A cluster-scale
deployment would run one such server per index root in front of the
persistent ``ShardedSearcherService`` fleet; the data plane stays Ray.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.facade import LuceneException, LuceneFacade
from lucene_plugin_ray.functions.queryparse import QueryParseError

# ---- demo UI (round 5; ≙ web/src/main/resources/public/index.html +
# lucene-client.js — same two forms / five calls, written from scratch
# against this server's endpoints) ----------------------------------------

_CLIENT_JS = """\
// Browser client for the lucene_plugin_ray HTTP service — the same call
// surface the reference's JS client exposes: indexText / indexMap /
// search / deleteDoc / clear.
function LuceneClient(base) { this.base = base; }

LuceneClient.prototype._post = function (op, params, cb) {
  fetch(this.base + "/" + op, {
    method: "POST",
    headers: {"Content-Type": "application/x-www-form-urlencoded"},
    body: new URLSearchParams(params).toString(),
  }).then(function (r) { return r.json(); })
    .then(function (j) { if (cb) cb(j); });
};

LuceneClient.prototype.indexText = function (collection, extId, text, cb) {
  this._post("index-text", {collection: collection, id: extId, text: text}, cb);
};

LuceneClient.prototype.indexMap = function (collection, extId, map, cb) {
  var params = {collection: collection, id: extId};
  for (var k in map) if (Object.hasOwn(map, k)) params[k] = map[k];
  this._post("index-map", params, cb);
};

LuceneClient.prototype.search = function (collection, query, limit, cb) {
  var qs = new URLSearchParams(
    {collection: collection, query: query, limit: limit}).toString();
  fetch(this.base + "/search?" + qs)
    .then(function (r) {
      return r.json().then(function (j) { return {ok: r.ok, body: j}; });
    })
    .then(function (res) {
      if (!res.ok) { cb(null, res.body.error); return; }
      cb(res.body.map(function (hit) { return hit._externalId; }), null);
    });
};

LuceneClient.prototype.deleteDoc = function (collection, extId, cb) {
  this._post("delete", {collection: collection, id: extId}, cb);
};

LuceneClient.prototype.clear = function (collection, cb) {
  this._post("clear", {collection: collection}, cb);
};
"""

_INDEX_HTML = """\
<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>lucene_plugin_ray demo</title>
<script src="lucene-client.js"></script>
<style>
  body { font-family: sans-serif; max-width: 46rem; margin: 2rem auto; }
  fieldset { margin-bottom: 1.5rem; }
  label { display: inline-block; min-width: 11rem; }
  input[type=text] { width: 24rem; }
  .row { margin: .3rem 0; }
  .out { color: #046; font-weight: bold; min-height: 1.2em; }
</style>
<script>
var client;
window.addEventListener("DOMContentLoaded", function () {
  client = new LuceneClient(window.location.origin + "%BASE%");
});
function $(id) { return document.getElementById(id); }

function textIndex() {
  client.indexText($("tColl").value, $("tId").value, $("tValue").value,
    function () { $("tOut").textContent = "indexed " + $("tId").value; });
  return false;
}
function textSearch() {
  client.search($("tColl").value, $("tValue").value, 255,
    function (ids, err) {
      $("tOut").textContent =
        err ? ("error: " + err) : (ids.length ? ids.join(", ") : "Not Found");
    });
  return false;
}
function mapIndex() {
  var m = {};
  for (var i = 0; i < 3; i++) {
    var k = $("mName" + i).value, v = $("mValue" + i).value;
    if (k) m[k] = v;
  }
  client.indexMap($("mColl").value, $("mId").value, m,
    function () { $("mOut").textContent = "indexed " + $("mId").value; });
  return false;
}
function mapSearch() {
  client.search($("mColl").value, $("mQuery").value, 255,
    function (ids, err) {
      $("mOut").textContent =
        err ? ("error: " + err) : (ids.length ? ids.join(", ") : "Not Found");
    });
  return false;
}
</script>
</head>
<body>
<h1>lucene_plugin_ray</h1>

<h2>Plain text: index &amp; search</h2>
<form id="text" onsubmit="return false;">
<fieldset>
  <div class="row"><label for="tColl">Collection</label>
    <input type="text" id="tColl" value="text-collection"></div>
  <div class="row"><label for="tId">External id</label>
    <input type="text" id="tId" placeholder="doc-1"></div>
  <div class="row"><label for="tValue">Text to index / query</label>
    <input type="text" id="tValue" placeholder="mary had a little lamb"></div>
  <div class="row">
    <button onclick="return textIndex()">Index</button>
    <button onclick="return textSearch()">Search</button>
    <span class="out" id="tOut"></span></div>
</fieldset>
</form>

<h2>Field map: index &amp; search</h2>
<form id="map" onsubmit="return false;">
<fieldset>
  <div class="row"><label for="mColl">Collection</label>
    <input type="text" id="mColl" value="map-collection"></div>
  <div class="row"><label for="mId">External id</label>
    <input type="text" id="mId" placeholder="doc-1"></div>
  <div class="row"><label for="mName0">Field 0 / value</label>
    <input type="text" id="mName0" value="firstName" style="width:10rem">
    <input type="text" id="mValue0" value="Harry" style="width:13rem"></div>
  <div class="row"><label for="mName1">Field 1 / value</label>
    <input type="text" id="mName1" value="lastName" style="width:10rem">
    <input type="text" id="mValue1" value="Potter" style="width:13rem"></div>
  <div class="row"><label for="mName2">Field 2 / value</label>
    <input type="text" id="mName2" style="width:10rem">
    <input type="text" id="mValue2" style="width:13rem"></div>
  <div class="row"><label for="mQuery">Query</label>
    <input type="text" id="mQuery" placeholder="firstName:harry"></div>
  <div class="row">
    <button onclick="return mapIndex()">Index</button>
    <button onclick="return mapSearch()">Search</button>
    <span class="out" id="mOut"></span></div>
</fieldset>
</form>
</body>
</html>
"""


class LuceneHttpService:
    """Serve a :class:`LuceneFacade` over HTTP on ``host:port``
    (``port=0`` → ephemeral).  ``start()`` runs the server on a daemon
    thread; ``shutdown()`` stops it and flushes pending writes."""

    def __init__(
        self,
        cfg: IndexConfig,
        host: str = "127.0.0.1",
        port: int = 0,
        base_path: str = "/lucene",
        file_root: str | None = None,
        **facade_kw,
    ):
        self.facade = LuceneFacade(cfg, **facade_kw)
        self._lock = threading.Lock()
        self.base_path = base_path.rstrip("/")
        # index-file reads server-side paths (reference parity,
        # LuceneFacadeImpl.java:43-53 — the Java facade trusts callers the
        # same way).  ``file_root`` confines them: any path resolving
        # outside it is rejected 400.  None (default) preserves the
        # reference's trust-the-caller behavior — bind non-loopback hosts
        # only with a file_root.
        self.file_root = os.path.realpath(file_root) if file_root else None
        service = self

        class _Handler(BaseHTTPRequestHandler):
            # quiet: request logging off the test/driver stdout
            def log_message(self, fmt, *args):  # noqa: N802
                pass

            def _respond(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _form(self) -> dict[str, str]:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n).decode() if n else ""
                return dict(parse_qsl(raw, keep_blank_values=True))

            def _static(self, body: str, ctype: str) -> None:
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _route(self, verb: str) -> None:
                url = urlsplit(self.path)
                if verb == "GET" and url.path in ("/", "/index.html"):
                    # demo UI (≙ the reference's public/index.html)
                    self._static(
                        _INDEX_HTML.replace("%BASE%", service.base_path),
                        "text/html; charset=utf-8",
                    )
                    return
                if verb == "GET" and url.path == "/lucene-client.js":
                    self._static(
                        _CLIENT_JS, "application/javascript; charset=utf-8"
                    )
                    return
                if not url.path.startswith(service.base_path + "/"):
                    self._respond(404, {"error": f"unknown path {url.path}"})
                    return
                op = url.path[len(service.base_path) + 1 :]
                try:
                    if verb == "GET" and op in service._GETS:
                        q = dict(parse_qsl(url.query, keep_blank_values=True))
                        self._respond(200, service._GETS[op](service, q))
                    elif verb == "POST" and op in service._POSTS:
                        self._respond(200, service._POSTS[op](service, self._form()))
                    else:
                        self._respond(404, {"error": f"unknown op {verb} {op}"})
                except (LuceneException, QueryParseError) as e:
                    # validation AND query-grammar failures are client errors
                    self._respond(400, {"error": str(e)})
                except Exception as e:  # pragma: no cover - defensive 500
                    self._respond(500, {"error": f"{type(e).__name__}: {e}"})

            def do_GET(self):  # noqa: N802
                self._route("GET")

            def do_POST(self):  # noqa: N802
                self._route("POST")

        class _Server(ThreadingHTTPServer):
            # non-daemon handler threads + block_on_close: server_close()
            # JOINS in-flight handlers, so a request acknowledged 200
            # cannot buffer a doc after shutdown()'s final commit (which
            # would silently lose an acknowledged write on process exit)
            daemon_threads = False

        self._httpd = _Server((host, port), _Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # ---- endpoint bodies (called with the parsed form/query dict) -------
    def _index_text(self, form: dict) -> bool:
        with self._lock:
            return self.facade.index_text(
                form.get("collection", ""), form.get("id", ""), form.get("text")
            )

    def _index_map(self, form: dict) -> bool:
        mapping = {
            k: v for k, v in form.items() if k not in ("collection", "id")
        }
        with self._lock:
            return self.facade.index_map(
                form.get("collection", ""), form.get("id", ""), mapping
            )

    def _index_file(self, form: dict) -> bool:
        path = form.get("path", "")
        if self.file_root is not None:
            real = os.path.realpath(path)
            if not (real + os.sep).startswith(self.file_root + os.sep):
                raise LuceneException(
                    f"path outside the served file root: {path!r}"
                )
            path = real
        with self._lock:
            return self.facade.index_file(form.get("collection", ""), path)

    def _delete(self, form: dict) -> bool:
        with self._lock:
            return self.facade.delete(form.get("collection", ""), form.get("id", ""))

    def _clear(self, form: dict):
        with self._lock:
            self.facade.clear(form.get("collection", ""))
        return None  # reference clear() completes with null

    def _search(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        with self._lock:
            self._read_your_writes()
            entries = self.facade.search(
                q.get("collection", ""), q.get("query", ""), limit=limit
            )
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_after(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        import math

        try:
            after_score = float(q.get("after_score", ""))
        except ValueError:
            raise LuceneException(
                f"after_score must be a float: {q.get('after_score')!r}"
            )
        if not math.isfinite(after_score):
            raise LuceneException("after_score must be finite")
        if "after_url" not in q:
            raise LuceneException("after_url is required")
        with self._lock:
            self._read_your_writes()
            entries = self.facade.search_after(
                q.get("collection", ""), q.get("query", ""),
                after_score, q["after_url"], limit=limit,
            )
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_filtered(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        with self._lock:
            self._read_your_writes()
            entries = self.facade.search_filtered(
                q.get("collection", ""), q.get("query", ""),
                q.get("filter_query", ""), limit=limit,
            )
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_surround(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.search_surround(
                    q.get("collection", ""), q.get("query", ""), limit=limit
                )
            except ValueError as e:  # SurroundParseError subclasses it
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_diversified(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            mpk = int(q.get("max_per_key") or 1)
        except ValueError:
            raise LuceneException(
                f"max_per_key must be an integer: {q['max_per_key']!r}"
            )
        with self._lock:
            self._read_your_writes()
            try:
                return self.facade.search_diversified(
                    q.get("collection", ""), q.get("query", ""),
                    q.get("key_field", ""), max_per_key=mpk, limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))

    def _search_expression_range(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        bindings = {}
        if q.get("bindings"):
            try:
                bindings = json.loads(q["bindings"])
            except json.JSONDecodeError as e:
                raise LuceneException(f"bindings must be a JSON object: {e}")
            if not isinstance(bindings, dict):
                raise LuceneException("bindings must be a JSON object")

        def _num(name):
            v = q.get(name)
            if v in (None, ""):
                return None
            try:
                return float(v)
            except ValueError:
                raise LuceneException(f"{name} must be a number: {v!r}")

        lo, hi = _num("lo"), _num("hi")
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.search_expression_range(
                    q.get("collection", ""), q.get("query", ""),
                    q.get("expression", ""), lo=lo, hi=hi,
                    bindings=bindings, limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_common(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            mtf = float(q.get("max_term_frequency") or 0.01)
        except ValueError:
            raise LuceneException(
                f"max_term_frequency must be a number: "
                f"{q['max_term_frequency']!r}"
            )
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.search_common(
                    q.get("collection", ""), q.get("query", ""),
                    max_term_frequency=mtf, limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_boosting(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            demote = float(q.get("demote") or 0.2)
        except ValueError:
            raise LuceneException(f"demote must be a number: {q['demote']!r}")
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.search_boosting(
                    q.get("collection", ""), q.get("positive_query", ""),
                    q.get("negative_query", ""), demote=demote, limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_expression(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        bindings = {}
        if q.get("bindings"):
            try:
                bindings = json.loads(q["bindings"])
            except json.JSONDecodeError as e:
                raise LuceneException(f"bindings must be a JSON object: {e}")
            if not isinstance(bindings, dict):
                raise LuceneException("bindings must be a JSON object")
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.search_expression(
                    q.get("collection", ""), q.get("query", ""),
                    q.get("expression", ""), bindings=bindings, limit=limit,
                )
            except ValueError as e:  # ExpressionError subclasses ValueError
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _span_near(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            terms = json.loads(q.get("terms", ""))
        except json.JSONDecodeError as e:
            raise LuceneException(f"terms must be a JSON list: {e}")
        if not isinstance(terms, list):
            raise LuceneException("terms must be a JSON list of strings")
        try:
            slop = int(q.get("slop") or 0)
        except ValueError:
            raise LuceneException(f"slop must be an integer: {q['slop']!r}")
        in_order_s = q.get("in_order", "true").lower()
        if in_order_s not in ("true", "false"):
            raise LuceneException(
                f"in_order must be 'true' or 'false': {q['in_order']!r}"
            )
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.span_near(
                    q.get("collection", ""), terms, slop=slop,
                    in_order=in_order_s == "true", limit=limit,
                )
            except ValueError as e:  # stopword/multi-token term, bad slop
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _span_first(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            end = int(q.get("end") or 0)
        except ValueError:
            raise LuceneException(f"end must be an integer: {q['end']!r}")
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.span_first(
                    q.get("collection", ""), q.get("term", ""), end,
                    limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _span_not(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            exclude = json.loads(q.get("exclude", ""))
        except json.JSONDecodeError as e:
            raise LuceneException(f"exclude must be a JSON list: {e}")
        if not isinstance(exclude, list):
            raise LuceneException("exclude must be a JSON list of strings")
        try:
            pre = int(q.get("pre") or 0)
            post = int(q.get("post") or 0)
        except ValueError:
            raise LuceneException("pre / post must be integers")
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.span_not(
                    q.get("collection", ""), q.get("term", ""), exclude,
                    pre=pre, post=post, limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _search_join(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.search_join(
                    q.get("collection", ""), q.get("from_query", ""),
                    q.get("from_field", ""), q.get("to_field", ""),
                    score_mode=q.get("score_mode", "max"), limit=limit,
                )
            except ValueError as e:  # bad score_mode / non-metadata field
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _block_join_parents(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.block_join_parents(
                    q.get("collection", ""), q.get("child_query", ""),
                    q.get("parent_filter", ""), q.get("block_field", ""),
                    score_mode=q.get("score_mode", "max"), limit=limit,
                )
            except ValueError as e:  # bad mode / field / contract violation
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _block_join_children(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        raw = q.get("score", "true").lower()
        if raw not in ("true", "false"):
            raise LuceneException(
                f"score must be 'true' or 'false', got {raw!r}"
            )
        score = raw == "true"
        with self._lock:
            self._read_your_writes()
            try:
                entries = self.facade.block_join_children(
                    q.get("collection", ""), q.get("parent_query", ""),
                    q.get("parent_filter", ""), q.get("block_field", ""),
                    score=score, limit=limit,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _drill_sideways(self, q: dict) -> dict:
        import json as _json

        limit = self._limit_of(q)
        try:
            dims = _json.loads(q.get("dims", ""))
        except ValueError as e:
            raise LuceneException(f"dims must be a JSON object: {e}")
        if not isinstance(dims, dict):
            raise LuceneException("dims must be a JSON object")
        with self._lock:
            self._read_your_writes()
            try:
                entries, counts = self.facade.drill_sideways(
                    q.get("collection", ""), q.get("query", ""), dims,
                    limit=limit,
                )
            except ValueError as e:  # unknown field / bad dim value
                raise LuceneException(str(e))
        return {
            "hits": [
                {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
                for e in entries
            ],
            "counts": {
                f: [[v, c] for v, c in items] for f, items in counts.items()
            },
        }

    def _search_sorted_by(self, q: dict) -> list[dict]:
        import json as _json

        limit = self._limit_of(q)
        try:
            sort = _json.loads(q.get("sort", ""))
        except ValueError as e:
            raise LuceneException(f"sort must be a JSON list: {e}")
        if not isinstance(sort, list):
            raise LuceneException("sort must be a JSON list of [field, dir]")
        after_keys = None
        if q.get("after_keys"):
            try:
                after_keys = _json.loads(q["after_keys"])
            except ValueError as e:
                raise LuceneException(f"after_keys must be a JSON list: {e}")
            if not isinstance(after_keys, list):
                raise LuceneException("after_keys must be a JSON list")
        with self._lock:
            self._read_your_writes()
            try:
                return self.facade.search_sorted_by(
                    q.get("collection", ""), q.get("query", ""), sort,
                    limit=limit, after_keys=after_keys,
                    after_url=q.get("after_url", ""),
                )
            except ValueError as e:  # bad field/dir/dup/anchor
                raise LuceneException(str(e))

    def _classify(self, q: dict) -> list[dict]:
        with self._lock:
            self._read_your_writes()
            try:
                rows = self.facade.classify(
                    q.get("collection", ""), q.get("text", ""),
                    q.get("class_field", ""),
                )
            except ValueError as e:  # zero tokens / unknown field
                raise LuceneException(str(e))
        return [{"class": c, "score": s} for c, s in rows]

    def _classify_knn(self, q: dict) -> list[dict]:
        try:
            k = int(q.get("k", "10"))
        except ValueError:
            raise LuceneException(f"k must be an integer: {q.get('k')!r}")
        with self._lock:
            self._read_your_writes()
            try:
                rows = self.facade.classify_knn(
                    q.get("collection", ""), q.get("text", ""),
                    q.get("class_field", ""), k=k,
                )
            except ValueError as e:
                raise LuceneException(str(e))
        return [
            {"class": c, "vote_units": v, "hits": h} for c, v, h in rows
        ]

    def _rescore(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            window = int(q["window"]) if q.get("window") else None
        except ValueError:
            raise LuceneException(f"window must be an integer: {q['window']!r}")
        try:
            weight = float(q.get("weight", "1.0"))
        except ValueError:
            raise LuceneException(f"weight must be a float: {q.get('weight')!r}")
        with self._lock:
            self._read_your_writes()
            entries = self.facade.rescore(
                q.get("collection", ""), q.get("query", ""),
                q.get("rescore_query", ""), window_size=window,
                weight=weight, limit=limit,
            )
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _limit_of(self, q: dict) -> int | None:
        try:
            return int(q["limit"]) if q.get("limit") else None
        except ValueError:
            raise LuceneException(f"limit must be an integer: {q['limit']!r}")

    def _read_your_writes(self) -> None:
        if self.facade._pending:  # read-your-writes (see module doc)
            self.facade.commit()

    def _count(self, q: dict) -> dict:
        with self._lock:
            self._read_your_writes()
            n = self.facade.count(q.get("collection", ""), q.get("query", ""))
        return {"count": n}

    def _facets(self, q: dict) -> list[dict]:
        with self._lock:
            self._read_your_writes()
            return self.facade.facets(
                q.get("collection", ""), q.get("query", ""), q.get("field", "")
            )

    def _facets_taxonomy(self, q: dict) -> list[dict]:
        import json as _json

        try:
            fields = _json.loads(q.get("fields", ""))
        except ValueError as e:
            raise LuceneException(f"fields must be a JSON list: {e}")
        if not isinstance(fields, list):
            raise LuceneException("fields must be a JSON list of field names")
        top_n = None
        if q.get("top_n"):
            try:
                top_n = int(q["top_n"])
            except ValueError:
                raise LuceneException(
                    f"top_n must be an integer: {q['top_n']!r}"
                )
        with self._lock:
            self._read_your_writes()
            try:
                return self.facade.facets_taxonomy(
                    q.get("collection", ""), q.get("query", ""), fields,
                    top_n=top_n,
                )
            except ValueError as e:  # unknown/dup field, bad top_n
                raise LuceneException(str(e))

    def _search_sorted(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        order = q.get("order", "desc")
        if order not in ("asc", "desc"):
            # a typo must not silently invert the requested sort
            raise LuceneException(f"order must be 'asc' or 'desc': {order!r}")
        after_ts = None
        if q.get("after_ts"):
            try:
                after_ts = int(q["after_ts"])
            except ValueError:
                raise LuceneException(
                    f"after_ts must be an integer: {q['after_ts']!r}"
                )
        with self._lock:
            self._read_your_writes()
            return self.facade.search_sorted(
                q.get("collection", ""),
                q.get("query", ""),
                limit=limit,
                descending=order != "asc",
                after_ts=after_ts,
                after_url=q.get("after_url", ""),
            )

    def _more_like_this(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            m = int(q.get("max_query_terms") or 25)
        except ValueError:
            raise LuceneException(
                f"max_query_terms must be an integer: {q['max_query_terms']!r}"
            )
        with self._lock:
            self._read_your_writes()
            entries = self.facade.more_like_this(
                q.get("collection", ""),
                q.get("text", ""),
                max_query_terms=m,
                limit=limit,
                exclude_id=q.get("exclude_id") or None,
            )
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _more_like_this_id(self, q: dict) -> list[dict]:
        limit = self._limit_of(q)
        try:
            m = int(q.get("max_query_terms") or 25)
        except ValueError:
            raise LuceneException(
                f"max_query_terms must be an integer: {q['max_query_terms']!r}"
            )
        with self._lock:
            self._read_your_writes()
            entries = self.facade.more_like_this_id(
                q.get("collection", ""), q.get("id", ""),
                max_query_terms=m, limit=limit,
            )
        return [
            {"_id": e.id, "_score": e.score, "_externalId": e.external_id}
            for e in entries
        ]

    def _snippets(self, form: dict) -> list[dict]:
        # POST (not GET): the hit bodies travel in the request.  ``texts``
        # is a JSON object {external_id: raw_text, ...}.
        try:
            texts = json.loads(form.get("texts") or "{}")
        except json.JSONDecodeError as e:
            raise LuceneException(f"texts must be a JSON object: {e}")
        if not isinstance(texts, dict):
            raise LuceneException("texts must be a JSON object")
        try:
            k = int(form.get("k") or 10)
            window = int(form.get("window") or 8)
        except ValueError:
            raise LuceneException("k / window must be integers")
        with self._lock:
            self._read_your_writes()
            return self.facade.snippets(
                form.get("collection", ""), form.get("query", ""),
                texts, k=k, window=window,
            )

    _POSTS = {
        "index-text": _index_text,
        "index-map": _index_map,
        "index-file": _index_file,
        "delete": _delete,
        "clear": _clear,
        "snippets": _snippets,
    }
    def _term_vector(self, q: dict) -> list[dict]:
        with self._lock:
            self._read_your_writes()
            try:
                return self.facade.term_vector(
                    q.get("collection", ""), q.get("id", ""),
                    field=q.get("field") or None,
                )
            except ValueError as e:  # non-analyzed field
                raise LuceneException(str(e))

    def _explain(self, q: dict) -> dict:
        with self._lock:
            self._read_your_writes()
            return self.facade.explain(
                q.get("collection", ""), q.get("query", ""), q.get("id", "")
            )

    def _suggest(self, q: dict) -> list[dict]:
        try:
            k = int(q.get("k") or 5)
            max_edits = int(q.get("max_edits") or 2)
        except ValueError:
            raise LuceneException("k / max_edits must be integers")
        with self._lock:
            self._read_your_writes()
            # through the facade like every other endpoint: empty
            # collection/term are 400s, not silently-defaulted junk scans
            return self.facade.suggest(
                q.get("collection", ""), q.get("term", ""),
                k=k, max_edits=max_edits,
            )

    def _complete(self, q: dict) -> list[dict]:
        try:
            k = int(q.get("k") or 5)
        except ValueError:
            raise LuceneException("k must be an integer")
        with self._lock:
            self._read_your_writes()
            return self.facade.complete(
                q.get("collection", ""), q.get("prefix", ""), k=k
            )

    def _complete_infix(self, q: dict) -> list[dict]:
        try:
            k = int(q.get("k") or 5)
        except ValueError:
            raise LuceneException("k must be an integer")
        with self._lock:
            self._read_your_writes()
            return self.facade.complete_infix(
                q.get("collection", ""), q.get("fragment", ""), k=k
            )

    _GETS = {
        "search": _search,
        "search-after": _search_after,
        "rescore": _rescore,
        "search-filtered": _search_filtered,
        "search-expression": _search_expression,
        "search-expression-range": _search_expression_range,
        "search-common": _search_common,
        "search-diversified": _search_diversified,
        "search-surround": _search_surround,
        "search-boosting": _search_boosting,
        "span-near": _span_near,
        "span-first": _span_first,
        "span-not": _span_not,
        "search-join": _search_join,
        "block-join-parents": _block_join_parents,
        "block-join-children": _block_join_children,
        "drill-sideways": _drill_sideways,
        "classify": _classify,
        "classify-knn": _classify_knn,
        "count": _count,
        "facets": _facets,
        "facets-taxonomy": _facets_taxonomy,
        "term-vector": _term_vector,
        "search-sorted": _search_sorted,
        "search-sorted-by": _search_sorted_by,
        "more-like-this": _more_like_this,
        "more-like-this-id": _more_like_this_id,
        "explain": _explain,
        "suggest": _suggest,
        "complete": _complete,
        "complete-infix": _complete_infix,
    }

    # ---- lifecycle -------------------------------------------------------
    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}{self.base_path}"

    def start(self) -> "LuceneHttpService":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        with self._lock:
            self.facade.commit()


class LuceneHttpClient:
    """Python twin of ``lucene-client.js`` (same five calls, same wire
    shapes) so the round-trip is testable without a browser."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")

    def _post(self, op: str, data: dict):
        import urllib.parse
        import urllib.request

        req = urllib.request.Request(
            f"{self.url}/{op}",
            data=urllib.parse.urlencode(data).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read().decode())

    def index_text(self, collection: str, ext_id: str, text: str):
        # ≙ lucene-client.js:24-36
        return self._post(
            "index-text", {"collection": collection, "id": ext_id, "text": text}
        )

    def index_map(self, collection: str, ext_id: str, mapping: dict):
        # ≙ lucene-client.js:54-69
        return self._post(
            "index-map", {"collection": collection, "id": ext_id, **mapping}
        )

    def search(self, collection: str, query: str, limit: int = 255) -> list[str]:
        # ≙ lucene-client.js:85-115 — returns the _externalId list
        import urllib.parse
        import urllib.request

        qs = urllib.parse.urlencode(
            {"collection": collection, "query": query, "limit": limit}
        )
        with urllib.request.urlopen(f"{self.url}/search?{qs}") as resp:
            results = json.loads(resp.read().decode())
        return [r["_externalId"] for r in results]

    def _get(self, op: str, params: dict):
        import urllib.parse
        import urllib.request

        qs = urllib.parse.urlencode(params)
        with urllib.request.urlopen(f"{self.url}/{op}?{qs}") as resp:
            return json.loads(resp.read().decode())

    def search_after(
        self, collection: str, query: str, after_score: float,
        after_url: str, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-after",
            {"collection": collection, "query": query,
             "after_score": after_score, "after_url": after_url,
             "limit": limit},
        )

    def search_filtered(
        self, collection: str, query: str, filter_query: str,
        limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-filtered",
            {"collection": collection, "query": query,
             "filter_query": filter_query, "limit": limit},
        )

    def search_surround(
        self, collection: str, query: str, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-surround",
            {"collection": collection, "query": query, "limit": limit},
        )

    def search_diversified(
        self, collection: str, query: str, key_field: str,
        max_per_key: int = 1, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-diversified",
            {"collection": collection, "query": query,
             "key_field": key_field, "max_per_key": max_per_key,
             "limit": limit},
        )

    def search_expression_range(
        self, collection: str, query: str, expression: str,
        lo: "float | None" = None, hi: "float | None" = None,
        bindings: dict | None = None, limit: int = 255,
    ) -> list[dict]:
        import json as _json

        params = {"collection": collection, "query": query,
                  "expression": expression,
                  "bindings": _json.dumps(bindings or {}), "limit": limit}
        if lo is not None:
            params["lo"] = lo
        if hi is not None:
            params["hi"] = hi
        return self._get("search-expression-range", params)

    def search_common(
        self, collection: str, query: str,
        max_term_frequency: float = 0.01, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-common",
            {"collection": collection, "query": query,
             "max_term_frequency": max_term_frequency, "limit": limit},
        )

    def search_boosting(
        self, collection: str, positive_query: str, negative_query: str,
        demote: float = 0.2, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-boosting",
            {"collection": collection, "positive_query": positive_query,
             "negative_query": negative_query, "demote": demote,
             "limit": limit},
        )

    def search_expression(
        self, collection: str, query: str, expression: str,
        bindings: dict | None = None, limit: int = 255,
    ) -> list[dict]:
        import json as _json

        return self._get(
            "search-expression",
            {"collection": collection, "query": query,
             "expression": expression,
             "bindings": _json.dumps(bindings or {}), "limit": limit},
        )

    def span_near(
        self, collection: str, terms: list, slop: int = 0,
        in_order: bool = True, limit: int = 255,
    ) -> list[dict]:
        import json as _json

        return self._get(
            "span-near",
            {"collection": collection, "terms": _json.dumps(list(terms)),
             "slop": slop, "in_order": "true" if in_order else "false",
             "limit": limit},
        )

    def span_first(
        self, collection: str, term: str, end: int, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "span-first",
            {"collection": collection, "term": term, "end": end,
             "limit": limit},
        )

    def span_not(
        self, collection: str, term: str, exclude: list, pre: int = 0,
        post: int = 0, limit: int = 255,
    ) -> list[dict]:
        import json as _json

        return self._get(
            "span-not",
            {"collection": collection, "term": term,
             "exclude": _json.dumps(list(exclude)), "pre": pre,
             "post": post, "limit": limit},
        )

    def search_join(
        self, collection: str, from_query: str, from_field: str,
        to_field: str, score_mode: str = "max", limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "search-join",
            {"collection": collection, "from_query": from_query,
             "from_field": from_field, "to_field": to_field,
             "score_mode": score_mode, "limit": limit},
        )

    def block_join_parents(
        self, collection: str, child_query: str, parent_filter: str,
        block_field: str, score_mode: str = "max", limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "block-join-parents",
            {"collection": collection, "child_query": child_query,
             "parent_filter": parent_filter, "block_field": block_field,
             "score_mode": score_mode, "limit": limit},
        )

    def block_join_children(
        self, collection: str, parent_query: str, parent_filter: str,
        block_field: str, score: bool = True, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "block-join-children",
            {"collection": collection, "parent_query": parent_query,
             "parent_filter": parent_filter, "block_field": block_field,
             "score": "true" if score else "false", "limit": limit},
        )

    def drill_sideways(
        self, collection: str, query: str, dims: dict, limit: int = 255,
    ) -> dict:
        import json as _json

        return self._get(
            "drill-sideways",
            {"collection": collection, "query": query,
             "dims": _json.dumps(dims), "limit": limit},
        )

    def search_sorted_by(
        self, collection: str, query: str, sort: list, limit: int = 255,
        after_keys: "list | None" = None, after_url: str = "",
    ) -> list[dict]:
        import json as _json

        params = {"collection": collection, "query": query,
                  "sort": _json.dumps(sort), "limit": limit}
        if after_keys is not None:
            params["after_keys"] = _json.dumps(after_keys)
            params["after_url"] = after_url
        return self._get("search-sorted-by", params)

    def classify(
        self, collection: str, text: str, class_field: str
    ) -> list[dict]:
        return self._get(
            "classify",
            {"collection": collection, "text": text,
             "class_field": class_field},
        )

    def classify_knn(
        self, collection: str, text: str, class_field: str, k: int = 10
    ) -> list[dict]:
        return self._get(
            "classify-knn",
            {"collection": collection, "text": text,
             "class_field": class_field, "k": k},
        )

    def rescore(
        self, collection: str, query: str, rescore_query: str,
        window: int = 255, weight: float = 1.0, limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "rescore",
            {"collection": collection, "query": query,
             "rescore_query": rescore_query, "window": window,
             "weight": weight, "limit": limit},
        )

    def count(self, collection: str, query: str) -> int:
        return self._get("count", {"collection": collection, "query": query})[
            "count"
        ]

    def facets(self, collection: str, query: str, field: str) -> list[dict]:
        return self._get(
            "facets", {"collection": collection, "query": query, "field": field}
        )

    def facets_taxonomy(
        self, collection: str, query: str, fields: list,
        top_n: int | None = None,
    ) -> list[dict]:
        import json as _json

        params = {"collection": collection, "query": query,
                  "fields": _json.dumps(fields)}
        if top_n is not None:
            params["top_n"] = top_n
        return self._get("facets-taxonomy", params)

    def search_sorted(
        self, collection: str, query: str, limit: int = 255,
        order: str = "desc", after_ts: int | None = None, after_url: str = "",
    ) -> list[dict]:
        params = {"collection": collection, "query": query, "limit": limit,
                  "order": order}
        if after_ts is not None:
            params["after_ts"] = after_ts
            params["after_url"] = after_url
        return self._get("search-sorted", params)

    def term_vector(
        self, collection: str, ext_id: str, field: str | None = None,
    ) -> list[dict]:
        params = {"collection": collection, "id": ext_id}
        if field is not None:
            params["field"] = field
        return self._get("term-vector", params)

    def explain(self, collection: str, query: str, ext_id: str) -> dict:
        return self._get(
            "explain", {"collection": collection, "query": query, "id": ext_id}
        )

    def suggest(
        self, collection: str, term: str, k: int = 5, max_edits: int = 2
    ) -> list[dict]:
        return self._get(
            "suggest",
            {"collection": collection, "term": term, "k": k,
             "max_edits": max_edits},
        )

    def complete(self, collection: str, prefix: str, k: int = 5) -> list[dict]:
        return self._get(
            "complete", {"collection": collection, "prefix": prefix, "k": k}
        )

    def complete_infix(
        self, collection: str, fragment: str, k: int = 5
    ) -> list[dict]:
        return self._get(
            "complete-infix",
            {"collection": collection, "fragment": fragment, "k": k},
        )

    def more_like_this_id(
        self, collection: str, ext_id: str, max_query_terms: int = 25,
        limit: int = 255,
    ) -> list[dict]:
        return self._get(
            "more-like-this-id",
            {"collection": collection, "id": ext_id,
             "max_query_terms": max_query_terms, "limit": limit},
        )

    def more_like_this(
        self, collection: str, text: str, max_query_terms: int = 25,
        limit: int = 255, exclude_id: str = "",
    ) -> list[str]:
        results = self._get(
            "more-like-this",
            {"collection": collection, "text": text,
             "max_query_terms": max_query_terms, "limit": limit,
             "exclude_id": exclude_id},
        )
        return [r["_externalId"] for r in results]

    def snippets(
        self, collection: str, query: str, texts: dict, k: int = 10,
        window: int = 8,
    ) -> list[dict]:
        return self._post(
            "snippets",
            {"collection": collection, "query": query,
             "texts": json.dumps(texts), "k": k, "window": window},
        )

    def delete(self, collection: str, ext_id: str):
        return self._post("delete", {"collection": collection, "id": ext_id})

    def clear(self, collection: str):
        # ≙ lucene-client.js:122-125
        return self._post("clear", {"collection": collection})
