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
  (CID fonts, object streams) fall back to empty text rather than garbage;
* **rtf** — group-aware control-word scanner (destination skipping,
  ``\\'hh`` hex and ``\\uN`` unicode escapes, paragraph specials);
* **xlsx** — shared-string table resolved per cell, inline strings and
  numeric values verbatim, rows → lines (OOXML detected by part-path
  probe ``xl/workbook.xml`` inside the zip);
* **pptx** — ``<a:t>`` runs per ``ppt/slides/slideN.xml`` in slide
  order (part-path probe ``ppt/presentation.xml``);
* **odt** — ``content.xml`` out of the ODF zip (detected via the spec's
  mandatory first ``mimetype`` entry), tag strip + entity decode;
* **ods** / **odp** — same mimetype probe
  ('…opendocument.spreadsheet' / '…presentation'); ods adds row/cell
  separators before the tag strip, odp rides the odt path (slide text
  lives in ``<text:p>``);
* **epub** — same zip-mimetype probe ('application/epub+zip'); every
  XHTML content document through the html stripper, <head> dropped;
* **md** / **csv** — content-heuristic detection (no magic bytes; Tika
  keys on filename), marker-stripping / cell-joining extraction; a
  heuristic miss degrades to txt (identity).

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
    """Magic-byte format detection (≙ Tika's auto-detect).

    ODF containers are distinguished from OOXML inside the shared zip
    magic by the ODF spec's mandatory FIRST entry: an uncompressed file
    named ``mimetype`` whose bytes start right after the 30-byte local
    header — exactly the probe Tika's zip detector uses.  Markdown and
    CSV have no magic bytes (Tika keys on filename); the content
    heuristics here are conservative — a miss degrades to 'txt', whose
    extractor is the identity."""
    if raw.startswith(b"%PDF"):
        return "pdf"
    if raw.startswith(b"{\\rtf"):
        return "rtf"
    if raw.startswith(b"PK\x03\x04"):
        if raw[30:38] == b"mimetype":
            mt = raw[38:120]
            if b"opendocument" in mt:
                if b"spreadsheet" in mt:
                    return "ods"
                if b"presentation" in mt:
                    return "odp"
                return "odt"
            if b"epub" in mt:
                return "epub"
        # OOXML: no mimetype entry; the payload type is named by the
        # TOP-LEVEL part paths.  Read the actual entry list (central
        # directory only — no data pages) rather than substring-scanning
        # the raw bytes: an embedded stored workbook (ppt/embeddings/
        # chart1.xlsx) carries the inner zip's headers verbatim and would
        # fool a byte probe.  This is the name probe Tika's zip detector
        # runs.
        try:
            import io as _io
            import zipfile as _zipfile

            names = _zipfile.ZipFile(_io.BytesIO(raw)).namelist()
            if any(n.startswith("word/") for n in names):
                return "docx"
            if any(n.startswith("xl/") for n in names):
                return "xlsx"
            if any(n.startswith("ppt/") for n in names):
                return "pptx"
        except Exception:
            pass
        return "docx"
    head = raw[:512].lstrip()
    if head[:1] == b"<":
        low = head[:64].lower()
        if low.startswith((b"<html", b"<!doctype html")):
            return "html"
        return "xml"
    if head[:1] in (b"{", b"["):
        return "json"
    if _looks_markdown(head):
        return "md"
    if _looks_csv(raw[:2048]):
        return "csv"
    return "txt"


_MD_CUES = (b"\n# ", b"\n## ", b"\n### ", b"\n- ", b"\n* ", b"\n```", b"](")


def _looks_markdown(head: bytes) -> bool:
    if head.startswith((b"# ", b"## ", b"### ", b"```")):
        return True
    return sum(1 for cue in _MD_CUES if cue in head) >= 2


def _csv_delims(line: bytes) -> int:
    """Unquoted commas in one line (RFC-4180 double-quote quoting)."""
    n = 0
    quoted = False
    for ch in line:
        if ch == 0x22:  # '"'
            quoted = not quoted
        elif ch == 0x2C and not quoted:  # ','
            n += 1
    return n


def _looks_csv(head: bytes) -> bool:
    lines = [ln for ln in head.split(b"\n")[:6] if ln.strip()]
    # drop a possibly-truncated trailing line before voting
    if len(head) == 2048 and lines:
        lines = lines[:-1]
    if len(lines) < 2:
        return False
    counts = [_csv_delims(ln) for ln in lines]
    if counts[0] < 1 or any(c != counts[0] for c in counts):
        return False
    # two short prose lines with one comma each ("Hello, world") must stay
    # txt — demand either 3+ consistent lines or 2+ delimiters per line
    return len(lines) >= 3 or counts[0] >= 2


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
        self.odt_p = re.compile(rb"</text:[ph]>")
        # RTF token stream: hex escape | control word (+signed arg) |
        # control symbol | group brace | raw text run
        self.rtf_tok = re.compile(
            rb"\\'([0-9a-fA-F]{2})"
            rb"|\\([a-zA-Z]+)(-?\d+)? ?"
            rb"|\\([^a-zA-Z])"
            rb"|([{}])"
            rb"|([^\\{}]+)"
        )
        self.epub_head = re.compile(rb"(?is)<head[^>]*>.*?</head>")
        # OOXML spreadsheet/presentation parts (round 5: xlsx/pptx/ods/odp)
        self.xlsx_si = re.compile(rb"<si>(.*?)</si>", re.S)
        self.xlsx_t = re.compile(rb"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
        # drop self-closing cells (blank styled cells, '<c r="A1" s="1"/>')
        # BEFORE the open/close matcher — otherwise '<c .../>' swallows the
        # next real cell and its t= attribute lands in the inner group
        self.xlsx_c_self = re.compile(rb"<c\b[^>]*/>")
        self.xlsx_c = re.compile(rb"<c\b([^>]*)>(.*?)</c>", re.S)
        self.xlsx_v = re.compile(rb"<v(?:\s[^>]*)?>(.*?)</v>", re.S)
        self.xlsx_row = re.compile(rb"</row>")
        self.xlsx_ts = re.compile(rb"""\bt\s*=\s*["']([^"']+)["']""")
        self.pptx_t = re.compile(rb"<a:t(?:\s[^>]*)?>(.*?)</a:t>", re.S)
        self.ods_row = re.compile(rb"</table:table-row>")
        self.ods_cell = re.compile(rb"</table:table-cell>")
        self.md_fence = re.compile(r"```.*?```", re.S)
        self.md_img = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
        self.md_link = re.compile(r"\[([^\]]*)\]\([^)]*\)")
        self.md_code = re.compile(r"`([^`]*)`")
        self.md_head = re.compile(r"(?m)^\s{0,3}(#{1,6}\s+|>\s?|[-*+]\s+|\d+\.\s+)")
        self.md_emph = re.compile(r"(\*{1,3}|_{1,3})(\S(?:.*?\S)?)\1")

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

    def _odt(self, raw: bytes) -> str:
        """ODF text documents: ``content.xml`` out of the zip (the docx
        pattern); ``</text:p>``/``</text:h>`` close paragraphs, all other
        tags strip, entities decode."""
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                doc = z.read("content.xml")
        except (zipfile.BadZipFile, KeyError):
            return ""
        s = self.odt_p.sub(b"\n", doc).decode("utf-8", errors="replace")
        s = self.tag.sub(" ", s)
        s = _html.unescape(s)
        return self.ws.sub(" ", s).strip()

    def _xlsx(self, raw: bytes) -> str:
        """OOXML spreadsheet: shared-string table resolved per cell
        (``t="s"`` cells hold an index into ``xl/sharedStrings.xml``, NOT
        text — emitting the raw ``<v>`` would print row numbers), inline
        strings and numeric values verbatim; cells joined by spaces, rows
        by newlines, sheets in zip order (Tika's XSSF text shape)."""
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                names = z.namelist()
                sst: list[str] = []
                if "xl/sharedStrings.xml" in names:
                    for si in self.xlsx_si.finditer(z.read("xl/sharedStrings.xml")):
                        runs = [m.group(1) for m in self.xlsx_t.finditer(si.group(1))]
                        sst.append(
                            _html.unescape(
                                b"".join(runs).decode("utf-8", errors="replace")
                            )
                        )
                lines: list[str] = []
                for name in names:
                    if not (name.startswith("xl/worksheets/")
                            and name.endswith(".xml")):
                        continue
                    sheet_xml = self.xlsx_c_self.sub(b"", z.read(name))
                    for rowchunk in self.xlsx_row.split(sheet_xml):
                        cells: list[str] = []
                        for cm in self.xlsx_c.finditer(rowchunk):
                            attrs, inner = cm.group(1), cm.group(2)
                            tm = self.xlsx_ts.search(attrs)
                            ctype = tm.group(1) if tm else b"n"
                            if ctype == b"s":
                                vm = self.xlsx_v.search(inner)
                                if vm:
                                    try:
                                        cells.append(sst[int(vm.group(1))])
                                    except (ValueError, IndexError):
                                        pass
                            elif ctype == b"inlineStr":
                                runs = [m.group(1)
                                        for m in self.xlsx_t.finditer(inner)]
                                cells.append(_html.unescape(
                                    b"".join(runs).decode("utf-8", errors="replace")))
                            else:  # n / b / str / e — the <v> text verbatim
                                vm = self.xlsx_v.search(inner)
                                if vm:
                                    cells.append(_html.unescape(
                                        vm.group(1).decode("utf-8", errors="replace")))
                        if cells:
                            lines.append(" ".join(cells))
        except (zipfile.BadZipFile, KeyError):
            return ""
        return self.ws.sub(" ", "\n".join(lines)).strip()

    def _pptx(self, raw: bytes) -> str:
        """OOXML presentation: every ``ppt/slides/slideN.xml`` in slide
        order (numeric sort — zip order is arbitrary), ``<a:t>`` runs
        joined, slides separated (Tika's XSLF text shape).  Notes and
        masters are skipped — metadata, not content."""
        import io
        import re as _re
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                slides = sorted(
                    (n for n in z.namelist()
                     if _re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
                    key=lambda n: int(_re.search(r"\d+", n.rsplit("/", 1)[1]).group()),
                )
                parts: list[str] = []
                for name in slides:
                    runs = [m.group(1) for m in self.pptx_t.finditer(z.read(name))]
                    if runs:
                        parts.append(_html.unescape(
                            b" ".join(runs).decode("utf-8", errors="replace")))
        except (zipfile.BadZipFile, KeyError):
            return ""
        return self.ws.sub(" ", "\n".join(parts)).strip()

    def _ods(self, raw: bytes) -> str:
        """ODF spreadsheet: ``content.xml`` with rows → newlines and cells
        → spaces before the generic tag strip (the odt pattern, plus the
        table separators)."""
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                doc = z.read("content.xml")
        except (zipfile.BadZipFile, KeyError):
            return ""
        doc = self.ods_row.sub(b"\n", doc)
        doc = self.ods_cell.sub(b" ", doc)
        s = self.tag.sub(" ", doc.decode("utf-8", errors="replace"))
        s = _html.unescape(s)
        return self.ws.sub(" ", s).strip()

    def _epub(self, raw: bytes) -> str:
        """EPUB: every XHTML content document in the container, in zip
        order, through the html stripper (Tika's EpubParser shape);
        container metadata files are skipped."""
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                parts = []
                for name in z.namelist():
                    low = name.lower()
                    if low.endswith((".xhtml", ".html", ".htm")):
                        # <head> is container metadata (title/meta/links),
                        # not content — drop it before the stripper
                        doc = self.epub_head.sub(b" ", z.read(name))
                        parts.append(self.html._extract_one(doc) or "")
        except (zipfile.BadZipFile, KeyError):
            return ""
        return self.ws.sub(" ", "\n".join(parts)).strip()

    # ignorable RTF destination groups (their text is metadata, not content)
    _RTF_DESTS = frozenset(
        {
            b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
            b"header", b"footer", b"headerl", b"headerr", b"footerl",
            b"footerr", b"generator", b"themedata", b"filetbl", b"listtable",
        }
    )
    _RTF_SPECIAL = {
        b"par": "\n", b"line": "\n", b"sect": "\n", b"page": "\n",
        b"tab": "\t", b"cell": " ", b"row": "\n", b"emdash": "—",
        b"endash": "–", b"lquote": "‘", b"rquote": "’",
        b"ldblquote": "“", b"rdblquote": "”", b"bullet": "•",
        b"~": " ", b"_": "-",
    }

    def _rtf(self, raw: bytes) -> str:
        """RTF → text: group-aware control-word scanner (stdlib-only).
        Handles destination skipping ({\\*\\...} and the known metadata
        destinations), \\'hh hex escapes, \\uN unicode with \\ucN
        fallback skipping, and the paragraph/line specials.  Unknown
        control words are dropped, their text kept — Tika's RTFParser
        behavior for plain documents."""
        out: list[str] = []
        # stack of (skipping, uc) per open group
        skip = False
        uc = 1
        stack: list[tuple[bool, int]] = []
        pending_skip = 0  # chars to swallow after \uN (the \ucN fallback)
        i = 0
        for m in self.rtf_tok.finditer(raw):
            hexc, word, arg, esc, brace, text = m.groups()
            if brace is not None:
                if brace == b"{":
                    stack.append((skip, uc))
                elif stack:
                    skip, uc = stack.pop()
                continue
            if hexc is not None:
                if pending_skip:
                    pending_skip -= 1
                elif not skip:
                    out.append(bytes([int(hexc, 16)]).decode("cp1252", errors="replace"))
                continue
            if word is not None:
                if word == b"u" and arg is not None:
                    if not skip:
                        cp = int(arg)
                        out.append(chr(cp + 0x10000 if cp < 0 else cp))
                    pending_skip = uc
                    continue
                if word == b"uc" and arg is not None:
                    uc = int(arg)
                    continue
                if word in self._RTF_DESTS:
                    skip = True
                    continue
                sp = self._RTF_SPECIAL.get(word)
                if sp is not None and not skip:
                    out.append(sp)
                continue
            if esc is not None:
                if esc == b"*":
                    skip = True  # \* marks the enclosing group ignorable
                elif not skip:
                    sp = self._RTF_SPECIAL.get(esc)
                    out.append(sp if sp is not None else esc.decode("cp1252"))
                continue
            if text is not None and not skip:
                if pending_skip:
                    t = text[pending_skip:]
                    pending_skip = max(0, pending_skip - len(text))
                else:
                    t = text
                if t:
                    out.append(t.replace(b"\r", b"").replace(b"\n", b"").decode(
                        "cp1252", errors="replace"
                    ))
        return self.ws.sub(" ", "".join(out)).strip()

    def _md(self, raw: bytes) -> str:
        """Markdown → text: fences/inline code unwrapped, images → alt,
        links → label, heading/list/quote/emphasis markers stripped."""
        s = raw.decode("utf-8", errors="replace")
        s = self.md_fence.sub(" ", s)
        s = self.md_img.sub(r"\1", s)
        s = self.md_link.sub(r"\1", s)
        s = self.md_code.sub(r"\1", s)
        s = self.md_head.sub("", s)
        s = self.md_emph.sub(r"\2", s)
        return self.ws.sub(" ", s).strip()

    def _csv(self, raw: bytes) -> str:
        """CSV → text: cells joined by spaces, rows by newlines (Tika's
        text/csv content handler shape), quoting handled by stdlib csv."""
        import csv
        import io

        try:
            rows = csv.reader(io.StringIO(raw.decode("utf-8", errors="replace")))
            s = "\n".join(" ".join(cells) for cells in rows)
        except csv.Error:
            s = raw.decode("utf-8", errors="replace")
        return self.ws.sub(" ", s).strip()

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
            "xlsx": self._xlsx,
            "pptx": self._pptx,
            "pdf": self._pdf,
            "rtf": self._rtf,
            "odt": self._odt,
            "ods": self._ods,
            "odp": self._odt,  # draw frames hold <text:p> — the odt path
            "epub": self._epub,
            "md": self._md,
            "csv": self._csv,
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
