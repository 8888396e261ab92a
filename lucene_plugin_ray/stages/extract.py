"""M1/S2 — multi-format raw-bytes → text extraction stage.

≙ the reference's Tika auto-detect parse path (AutoDetectParser.parse,
LuceneIndexBean.java:245-248; indexFile 200-228), pinned by
TestSearchByFirstWord.java:29-70 across txt/xml/json/pdf/docx: raw document
bytes → plain text, format chosen by magic-byte sniffing.  NOT on the
conformance path — the input_hint table already carries the extracted
``text`` column (SURVEY.md §1.2); this stage exists for pipelines that start
from raw payload bytes.

Extractors are dependency-free (this container has no Tika/media libs):

* **txt** — UTF-8 decode;
* **html** — compiled-regex stripper (script/style removal, tag strip,
  entity decode);
* **xml** — tag strip + entity decode (Tika's SAX text-only path);
* **json** — every string value in document order (stdlib json);
* **docx** — ``word/document.xml`` out of the OOXML zip (stdlib zipfile),
  ``<w:t>`` runs joined, paragraphs separated;
* **pdf** — best-effort: Flate/raw content streams inflated (stdlib zlib),
  text drawn from ``Tj``/``TJ`` operators.  Handles the common
  text-PDF shape (covers the reference fixture); exotic encodings
  (CID fonts, object streams) fall back to empty text rather than garbage.

All extractors run inside a ``map_batches`` callable class — regexes compiled
once per actor/task (T7 ≙ AutoDetectParser instance,
LuceneIndexBean.java:85,116-119).
"""

from __future__ import annotations

import html as _html
import json as _json
import re
import zlib

import pyarrow as pa


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


def sniff_format(raw: bytes) -> str:
    """Magic-byte format detection (≙ Tika's auto-detect)."""
    if raw.startswith(b"%PDF"):
        return "pdf"
    if raw.startswith(b"PK\x03\x04"):
        return "docx"
    head = raw[:512].lstrip()
    if head[:1] == b"<":
        low = head[:64].lower()
        if low.startswith((b"<html", b"<!doctype html")):
            return "html"
        return "xml"
    if head[:1] in (b"{", b"["):
        return "json"
    return "txt"


class AutoExtract:
    """Auto-detecting multi-format extraction stage:

        ds.map_batches(AutoExtract, batch_format="pyarrow", concurrency=N)

    turns the ``raw`` binary column into ``text`` + ``format`` columns.
    Binary payloads are naturally large — run with a small ``batch_size``.
    """

    # PDF string literal with \-escapes (no nested unescaped parens handled —
    # simple generators don't emit them)
    _PDF_STR = re.compile(rb"\((?:\\.|[^\\()])*\)")
    _PDF_TEXTOP = re.compile(
        rb"(\[(?:[^\[\]]|\((?:\\.|[^\\()])*\))*\]\s*TJ)|(\((?:\\.|[^\\()])*\)\s*Tj)",
        re.S,
    )
    _PDF_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
    _PDF_ESC = {
        b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b",
        b"\\f": b"\f", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
    }

    def __init__(self, raw_column: str = "raw", out_column: str = "text"):
        self.raw_column = raw_column
        self.out_column = out_column
        self.html = HtmlExtract()  # reuse its compiled regexes
        self.tag = self.html.tag
        self.ws = self.html.ws
        self.docx_t = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.S)
        self.docx_p = re.compile(rb"</w:p>")

    # ---- per-format extractors ------------------------------------------
    def _txt(self, raw: bytes) -> str:
        return raw.decode("utf-8", errors="replace")

    def _xml(self, raw: bytes) -> str:
        s = raw.decode("utf-8", errors="replace")
        s = self.tag.sub(" ", s)
        s = _html.unescape(s)
        return self.ws.sub(" ", s).strip()

    def _json(self, raw: bytes) -> str:
        try:
            obj = _json.loads(raw.decode("utf-8", errors="replace"))
        except ValueError:
            return self._txt(raw)
        parts: list[str] = []

        def walk(o):
            if isinstance(o, str):
                parts.append(o)
            elif isinstance(o, dict):
                for v in o.values():
                    walk(v)
            elif isinstance(o, list):
                for v in o:
                    walk(v)

        walk(obj)
        return self.ws.sub(" ", " ".join(parts)).strip()

    def _docx(self, raw: bytes) -> str:
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                doc = z.read("word/document.xml")
        except (zipfile.BadZipFile, KeyError):
            return ""
        doc = self.docx_p.sub(b"</w:p>\n", doc)
        parts = []
        pos = 0
        for para in doc.split(b"\n"):
            runs = [m.group(1) for m in self.docx_t.finditer(para)]
            if runs:
                parts.append(
                    _html.unescape(b"".join(runs).decode("utf-8", errors="replace"))
                )
            pos += 1
        return self.ws.sub(" ", "\n".join(parts)).strip()

    def _pdf_unescape(self, s: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(s):
            if s[i : i + 1] == b"\\" and i + 1 < len(s):
                two = s[i : i + 2]
                if two in self._PDF_ESC:
                    out += self._PDF_ESC[two]
                    i += 2
                    continue
                if s[i + 1 : i + 2].isdigit():  # octal escape
                    j = i + 1
                    while j < len(s) and j < i + 4 and s[j : j + 1].isdigit():
                        j += 1
                    out.append(int(s[i + 1 : j], 8) & 0xFF)
                    i = j
                    continue
                i += 1  # line continuation / unknown escape: drop backslash
                continue
            out.append(s[i])
            i += 1
        return bytes(out)

    def _pdf(self, raw: bytes) -> str:
        parts: list[str] = []
        for m in self._PDF_STREAM.finditer(raw):
            data = m.group(1)
            try:
                content = zlib.decompress(data)
            except zlib.error:
                content = data  # uncompressed content stream
            for op in self._PDF_TEXTOP.finditer(content):
                for lit in self._PDF_STR.finditer(op.group(0)):
                    parts.append(
                        self._pdf_unescape(lit.group(0)[1:-1]).decode(
                            "latin-1", errors="replace"
                        )
                    )
                parts.append(" ")  # text-op boundary
        return self.ws.sub(" ", "".join(parts)).strip()

    def extract_one(self, raw: bytes | None) -> tuple[str | None, str | None]:
        if raw is None:
            return None, None
        fmt = sniff_format(raw)
        fn = {
            "txt": self._txt,
            "html": self.html._extract_one,
            "xml": self._xml,
            "json": self._json,
            "docx": self._docx,
            "pdf": self._pdf,
        }[fmt]
        return fn(raw), fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = batch[self.raw_column].combine_chunks()
        texts, fmts = [], []
        for v in raw:
            t, f = self.extract_one(v.as_py() if v.is_valid else None)
            texts.append(t)
            fmts.append(f)
        if self.out_column in batch.column_names:
            batch = batch.drop_columns([self.out_column])
        return batch.append_column(
            self.out_column, pa.array(texts, type=pa.string())
        ).append_column("format", pa.array(fmts, type=pa.string()))
