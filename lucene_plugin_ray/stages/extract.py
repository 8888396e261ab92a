"""M1/S2 — optional HTML → text extraction stage.

≙ the reference's Tika auto-detect parse path (AutoDetectParser.parse,
LuceneIndexBean.java:245-248; indexFile 200-228): raw document bytes → plain
text.  NOT on the conformance path — the input_hint table already carries the
extracted ``text`` column, and the byte-identity invariant (SURVEY.md §1.2)
is defined on that column.  This stage exists for pipelines that start from
raw ``html`` bytes.

Stateless ``map_batches`` stage; the parser is a compiled-regex stripper
(script/style removal, tag strip, entity decode, whitespace collapse) — a
deterministic, dependency-free equivalent of Tika's HTML text path.  The
regexes are compiled ONCE per actor/task via the callable-class pattern.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa
import pyarrow.compute as pc


class HtmlExtract:
    """Callable class for ``ds.map_batches(HtmlExtract, batch_format="pyarrow",
    concurrency=N)`` — turns the ``html`` binary column into a ``text``
    column (existing ``text`` is replaced)."""

    def __init__(self, html_column: str = "html", out_column: str = "text"):
        self.html_column = html_column
        self.out_column = out_column
        # compiled once per actor (T7 ≙ AutoDetectParser instance,
        # LuceneIndexBean.java:85,116-119)
        self.script = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
        self.tag = re.compile(r"(?s)<[^>]+>")
        self.ws = re.compile(r"\s+")

    def _extract_one(self, raw: bytes | None) -> str | None:
        if raw is None:
            return None
        s = raw.decode("utf-8", errors="replace")
        s = self.script.sub(" ", s)
        s = self.tag.sub(" ", s)
        s = _html.unescape(s)
        return self.ws.sub(" ", s).strip()

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = batch[self.html_column].combine_chunks()
        texts = pa.array(
            [self._extract_one(v.as_py() if v.is_valid else None) for v in raw],
            type=pa.string(),
        )
        if self.out_column in batch.column_names:
            batch = batch.drop_columns([self.out_column])
        return batch.append_column(self.out_column, texts)
