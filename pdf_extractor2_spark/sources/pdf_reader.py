"""From-scratch PDF payload front-end (SURVEY.md §2.9, BASELINE north_star:
"xref/object-stream walking, text-run positional clustering into
lines/blocks").

No pdf library: this module implements, with the stdlib only,
  1. object-level parsing — lexer for PDF syntax (dicts, arrays, names,
     numbers, literal/hex strings, references, streams);
  2. cross-reference walking — classic ``xref`` tables AND cross-reference
     streams (/Type/XRef, W-field decoding) with /ObjStm object streams;
  3. FlateDecode stream filters (zlib);
  4. a content-stream interpreter for the text operators
     BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, TJ, ' and the path operators
     m/l/S (ruling lines), producing positioned text runs per page;
  5. positional clustering:
       * lines: runs grouped by y (tolerance-parameterized), sorted by x;
       * page text: lines top-to-bottom, runs joined with single spaces;
       * "stream" table profile: whitespace-aligned column clustering at
         the reference's four tolerance configs (scraper.py:1192-1197) —
         the model-selection score picks the best config downstream;
       * "lattice" table profile: cell grids bounded by drawn rulings.

Scope is bounded by the fixture writer (sources/pdf_writer.py) per
FIXTURES.md §1b; unsupported constructs raise, which the extraction
kernel converts into failure rows.
"""

from __future__ import annotations

import re
import zlib
from bisect import bisect_right
from dataclasses import dataclass, field

Grid = list[list[str]]

# the reference's camelot-stream tolerance sweep, re-expressed for our
# clusterer: (row_tol, column_tol); config 0 = camelot defaults
STREAM_CONFIGS = [(2.0, 0.5), (10.0, 5.0), (15.0, 10.0), (20.0, 15.0)]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


# decompression bound: a zlib bomb in one document must become a failure
# row, not a stalled executor (SURVEY.md §9 "document-size skew")
MAX_INFLATED_BYTES = 256 * 1024 * 1024


def _bounded_inflate(raw: bytes) -> bytes:
    d = zlib.decompressobj()
    out = d.decompress(raw, MAX_INFLATED_BYTES)
    if d.unconsumed_tail:
        raise PdfError("FlateDecode output exceeds bound (decompression bomb?)")
    return out


# ---------------------------------------------------------------------------
# lexer / object parser
# ---------------------------------------------------------------------------

class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def peek_bytes(self, k: int) -> bytes:
        return self.data[self.pos : self.pos + k]

    def read_token(self) -> bytes:
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise PdfError("eof")
        c = d[self.pos]
        if c == 0x3C and self.pos + 1 < n and d[self.pos + 1] == 0x3C:
            self.pos += 2
            return b"<<"
        if c == 0x3E and self.pos + 1 < n and d[self.pos + 1] == 0x3E:
            self.pos += 2
            return b">>"
        if c in b"[]<>(){}":
            self.pos += 1
            return bytes([c])
        if c == 0x2F:  # name
            start = self.pos
            self.pos += 1
            while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
                self.pos += 1
            return d[start : self.pos]
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise PdfError(f"lex stall at {self.pos}")
        return d[start : self.pos]

    def read_literal_string(self) -> bytes:
        # called with pos just after '('
        d, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                e = d[self.pos]
                self.pos += 1
                mapped = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                    0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
                }.get(e)
                if mapped is not None:
                    out.append(mapped)
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = chr(e)
                    while len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits += chr(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    if e == 0x0D and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise PdfError("unterminated string")

    def read_hex_string(self) -> bytes:
        # called with pos just after '<'
        end = self.data.index(b">", self.pos)
        hexpart = re.sub(rb"\s", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(hexpart) % 2:
            hexpart += b"0"
        return bytes.fromhex(hexpart.decode("ascii"))


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


_NUM_RE = re.compile(rb"^[+-]?(\d+\.?\d*|\.\d+)$")


def _parse_value(lx: _Lexer):
    tok = lx.read_token()
    return _parse_value_tok(lx, tok)


def _parse_value_tok(lx: _Lexer, tok: bytes):
    if tok == b"<<":
        d = {}
        while True:
            key = lx.read_token()
            if key == b">>":
                return d
            if not key.startswith(b"/"):
                raise PdfError(f"bad dict key {key!r}")
            d[key[1:].decode("latin-1")] = _parse_value(lx)
    if tok == b"[":
        arr = []
        while True:
            lx._skip_ws()
            if lx.peek_bytes(1) == b"]":
                lx.pos += 1
                return arr
            arr.append(_parse_value(lx))
    if tok == b"(":
        return lx.read_literal_string()
    if tok == b"<":
        return lx.read_hex_string()
    if tok.startswith(b"/"):
        return ("name", tok[1:].decode("latin-1"))
    if tok in (b"true", b"false"):
        return tok == b"true"
    if tok == b"null":
        return None
    if _NUM_RE.match(tok):
        # possible reference: NUM GEN R
        save = lx.pos
        if b"." not in tok:
            try:
                t2 = lx.read_token()
                if _NUM_RE.match(t2) and b"." not in t2:
                    t3 = lx.read_token()
                    if t3 == b"R":
                        return Ref(int(tok), int(t2))
                lx.pos = save
            except PdfError:
                lx.pos = save
            return int(tok)
        return float(tok)
    raise PdfError(f"unexpected token {tok!r}")


# ---------------------------------------------------------------------------
# document: xref walking + object resolution
# ---------------------------------------------------------------------------

class PdfDocument:
    def __init__(self, data: bytes):
        if data[:5] != b"%PDF-":
            raise PdfError("not a PDF")
        self.data = data
        self.trailer: dict = {}
        # num -> ("direct", offset) | ("objstm", stm_num, index)
        self._xref: dict[int, tuple] = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._load_xref()

    # -- xref ---------------------------------------------------------------

    def _load_xref(self) -> None:
        tail = self.data[-256:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise PdfError("no startxref")
        pos = int(m[-1].group(1))
        seen: set[int] = set()
        while pos not in seen:
            seen.add(pos)
            prev = self._load_xref_section(pos)
            if prev is None:
                break
            pos = prev

    def _load_xref_section(self, pos: int):
        lx = _Lexer(self.data, pos)
        tok = lx.read_token()
        if tok == b"xref":
            # classic table
            while True:
                save = lx.pos
                tok = lx.read_token()
                if tok == b"trailer":
                    trailer = _parse_value(lx)
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    return trailer.get("Prev")
                first = int(tok)
                count = int(lx.read_token())
                lx._skip_ws()
                for i in range(count):
                    entry = self.data[lx.pos : lx.pos + 20]
                    lx.pos += 20
                    offset, gen, kind = entry[:10], entry[11:16], entry[17:18]
                    num = first + i
                    if kind == b"n" and num not in self._xref:
                        self._xref[num] = ("direct", int(offset))
                del save
        else:
            # xref stream: tok is the object number
            num = int(tok)
            int(lx.read_token())  # gen
            if lx.read_token() != b"obj":
                raise PdfError("bad xref stream object")
            d, raw = self._read_stream_obj(lx)
            for k, v in d.items():
                if k not in ("Type", "W", "Index", "Length", "Filter", "Size"):
                    self.trailer.setdefault(k, v)
            if "Size" in d:
                self.trailer.setdefault("Size", d["Size"])
            w = [int(x) for x in d["W"]]
            size = int(d["Size"])
            index = d.get("Index", [0, size])
            rw = sum(w)
            entries = [raw[i : i + rw] for i in range(0, len(raw), rw)]
            ei = 0
            for s in range(0, len(index), 2):
                start, cnt = int(index[s]), int(index[s + 1])
                for num2 in range(start, start + cnt):
                    if ei >= len(entries):
                        break
                    e = entries[ei]
                    ei += 1
                    fields = []
                    off = 0
                    for width in w:
                        fields.append(
                            int.from_bytes(e[off : off + width], "big") if width else 1
                        )
                        off += width
                    t, f2, f3 = fields
                    if num2 in self._xref:
                        continue
                    if t == 1:
                        self._xref[num2] = ("direct", f2)
                    elif t == 2:
                        self._xref[num2] = ("objstm", f2, f3)
            return d.get("Prev")

    # -- object resolution ----------------------------------------------------

    def _read_stream_obj(self, lx: _Lexer):
        """Parse a stream object at lx (dict already next); returns
        (dict, decoded_bytes)."""
        d = _parse_value(lx)
        if not isinstance(d, dict):
            raise PdfError("stream without dict")
        lx._skip_ws()
        if lx.peek_bytes(6) != b"stream":
            return d, None
        lx.pos += 6
        if self.data[lx.pos : lx.pos + 2] == b"\r\n":
            lx.pos += 2
        elif self.data[lx.pos : lx.pos + 1] == b"\n":
            lx.pos += 1
        length = self.resolve(d["Length"])
        raw = self.data[lx.pos : lx.pos + int(length)]
        lx.pos += int(length)
        filt = d.get("Filter")
        if filt is not None:
            names = [filt] if not isinstance(filt, list) else filt
            for f in names:
                if f == ("name", "FlateDecode"):
                    raw = _bounded_inflate(raw)
                elif f == ("name", "ASCIIHexDecode"):
                    body = raw.split(b">")[0]
                    hexpart = re.sub(rb"\s", b"", body)
                    if len(hexpart) % 2:
                        hexpart += b"0"
                    raw = bytes.fromhex(hexpart.decode("ascii"))
                else:
                    raise PdfError(f"unsupported filter {f!r}")
        return d, raw

    def resolve(self, value):
        if isinstance(value, Ref):
            return self.get_object(value.num)
        return value

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        entry = self._xref.get(num)
        if entry is None:
            raise PdfError(f"missing object {num}")
        if entry[0] == "direct":
            lx = _Lexer(self.data, entry[1])
            onum = int(lx.read_token())
            if onum != num:
                raise PdfError(f"xref mismatch for {num}")
            int(lx.read_token())
            if lx.read_token() != b"obj":
                raise PdfError("bad obj header")
            save = lx.pos
            value = _parse_value(lx)
            lx._skip_ws()
            if isinstance(value, dict) and lx.peek_bytes(6) == b"stream":
                lx.pos = save
                value = self._read_stream_obj(lx)  # (dict, bytes)
        else:
            _, stm_num, idx = entry
            value = self._objstm_objects(stm_num)[idx]
        self._cache[num] = value
        return value

    def _objstm_objects(self, stm_num: int) -> list:
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        d, raw = self.get_object(stm_num)
        n, first = int(self.resolve(d["N"])), int(self.resolve(d["First"]))
        header = _Lexer(raw[:first])
        pairs = []
        for _ in range(n):
            onum = int(header.read_token())
            off = int(header.read_token())
            pairs.append((onum, off))
        objs = []
        for _, off in pairs:
            objs.append(_parse_value(_Lexer(raw, first + off)))
        self._objstm_cache[stm_num] = objs
        return objs

    # -- page tree ------------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []

        def walk(node_ref):
            node = self.resolve(node_ref)
            t = node.get("Type")
            if t == ("name", "Pages"):
                for kid in node["Kids"]:
                    walk(kid)
            else:
                out.append(node)

        walk(root["Pages"])
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, tuple):  # (dict, bytes) stream
            return contents[1]
        if isinstance(contents, list):
            parts = []
            for ref in contents:
                obj = self.resolve(ref)
                parts.append(obj[1] if isinstance(obj, tuple) else b"")
            return b"\n".join(parts)
        raise PdfError("bad /Contents")


# ---------------------------------------------------------------------------
# content-stream interpreter
# ---------------------------------------------------------------------------

@dataclass
class TextRun:
    x: float
    y: float
    text: str


@dataclass
class Segment:
    x0: float
    y0: float
    x1: float
    y1: float


# specialized content-stream tokenizer: one compiled alternation instead
# of the generic char-level lexer (the per-token overhead dominated the
# PDF kernel cost — ~2.5x faster on the fixture corpus)
_CONTENT_TOK = re.compile(
    rb"[\x00\t\n\x0c\r ]*"  # leading whitespace folded into the token
    rb"(?:(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<lparen>\()"
    rb"|(?P<hex><[0-9A-Fa-f\s]*>)"
    rb"|(?P<bracket>[\[\]])"
    rb"|(?P<op>[A-Za-z'\"*]+)"
    rb"|(?P<other>.))",
    re.DOTALL,
)


def interpret_content(content: bytes) -> tuple[list[TextRun], list[Segment]]:
    """Walk one content stream; return positioned text runs and stroked
    line segments (for ruling detection)."""
    runs: list[TextRun] = []
    segments: list[Segment] = []
    stack: list = []

    line_x = line_y = 0.0  # text line matrix origin (translation part)
    leading = 0.0
    path: list[tuple[float, float]] = []
    pending_segments: list[Segment] = []

    def shown(text_bytes: bytes) -> None:
        text = text_bytes.decode("utf-8", errors="replace")
        if text:
            runs.append(TextRun(line_x, line_y, text))

    pos, n = 0, len(content)
    arrays: list[list] = []  # nesting stack for [...] operands
    match = _CONTENT_TOK.match

    while pos < n:
        m = match(content, pos)
        if m is None:
            break
        pos = m.end()
        kind = m.lastgroup
        if kind == "num":
            value = float(m.group("num"))
            (arrays[-1] if arrays else stack).append(value)
            continue
        if kind == "lparen":
            lx = _Lexer(content, pos)
            s = lx.read_literal_string()
            pos = lx.pos
            (arrays[-1] if arrays else stack).append(s)
            continue
        if kind == "hex":
            h = m.group("hex")
            hexpart = re.sub(rb"\s", b"", h[1:-1])
            if len(hexpart) % 2:
                hexpart += b"0"
            s = bytes.fromhex(hexpart.decode("ascii"))
            (arrays[-1] if arrays else stack).append(s)
            continue
        if kind == "name":
            value = ("name", m.group("name")[1:].decode("latin-1"))
            (arrays[-1] if arrays else stack).append(value)
            continue
        if kind == "bracket":
            if m.group("bracket") == b"[":
                arrays.append([])
            elif arrays:
                arr = arrays.pop()
                (arrays[-1] if arrays else stack).append(arr)
            continue
        if kind == "other":
            continue

        op = m.group("op")
        if op == b"Tm":
            line_x, line_y = float(stack[-2]), float(stack[-1])
        elif op == b"Td":
            line_x += float(stack[-2])
            line_y += float(stack[-1])
        elif op == b"TD":
            line_x += float(stack[-2])
            line_y += float(stack[-1])
            leading = -float(stack[-1])
        elif op == b"TL":
            leading = float(stack[-1])
        elif op == b"T*":
            line_y -= leading
        elif op == b"Tj":
            shown(stack[-1])
        elif op == b"'":
            line_y -= leading
            shown(stack[-1])
        elif op == b"TJ":
            parts = [e for e in stack[-1] if isinstance(e, bytes)]
            shown(b"".join(parts))
        elif op == b"BT":
            line_x = line_y = 0.0
        elif op == b"m":
            path = [(float(stack[-2]), float(stack[-1]))]
        elif op == b"l":
            prev = path[-1] if path else (0.0, 0.0)
            pt = (float(stack[-2]), float(stack[-1]))
            pending_segments.append(Segment(prev[0], prev[1], pt[0], pt[1]))
            path.append(pt)
        elif op == b"S":
            segments.extend(pending_segments)
            pending_segments = []
            path = []
        stack.clear()

    return runs, segments


# ---------------------------------------------------------------------------
# positional clustering
# ---------------------------------------------------------------------------

def cluster_lines(runs: list[TextRun], row_tol: float) -> list[list[TextRun]]:
    """Group runs into lines by y (descending), tolerance-chained."""
    if not runs:
        return []
    ordered = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[list[TextRun]] = [[ordered[0]]]
    for run in ordered[1:]:
        if lines[-1][-1].y - run.y <= row_tol:
            lines[-1].append(run)
        else:
            lines.append([run])
    return [sorted(line, key=lambda r: (r.x, -r.y)) for line in lines]


def page_text_from_runs(runs: list[TextRun]) -> str:
    lines = cluster_lines(runs, row_tol=2.0)
    return "\n".join(" ".join(r.text for r in line) for line in lines)


def _cluster_positions(xs: list[float], tol: float) -> list[float]:
    """Cluster sorted x positions; returns cluster centers (first member)."""
    centers: list[float] = []
    for x in sorted(xs):
        if not centers or x - centers[-1] > tol:
            centers.append(x)
    return centers


def stream_tables(runs: list[TextRun], row_tol: float, col_tol: float) -> list[Grid]:
    """Whitespace-alignment table detection (camelot-stream profile):
    consecutive multi-run lines form a region; columns are x clusters.
    Single-run lines indented past the page's left margin are treated as
    continuation lines (multi-line cells) and stay inside the region."""
    lines = cluster_lines(runs, row_tol)
    left_margin = min((r.x for r in runs), default=0.0)
    tables: list[Grid] = []
    region: list[list[TextRun]] = []

    def flush():
        nonlocal region
        if len(region) >= 2:
            xs = [r.x for line in region for r in line]
            cols = _cluster_positions(xs, col_tol)
            # rightmost column with r.x >= cx - col_tol, as a bisect over
            # the precomputed thresholds: cols is ascending, x ↦ x - tol
            # is monotone, and the comparison floats are the IDENTICAL
            # `cx - col_tol` values the former max-genexpr computed — so
            # this is bit-equivalent, not merely "close" (the per-run
            # linear scan was the hottest line of the stream profile)
            thresholds = [cx - col_tol for cx in cols]
            grid: Grid = []
            for line in region:
                row = [""] * len(cols)
                for r in line:
                    ci = bisect_right(thresholds, r.x) - 1
                    row[ci] = (row[ci] + "\n" + r.text) if row[ci] else r.text
                grid.append(row)
            tables.append(grid)
        region = []

    for line in lines:
        if len(line) >= 2 or (region and len(line) == 1 and line[0].x > left_margin + 1):
            region.append(line)
        else:
            flush()
    flush()
    return tables


def lattice_tables(runs: list[TextRun], segments: list[Segment]) -> list[Grid]:
    """Ruled-table detection (camelot-lattice profile): horizontal and
    vertical rulings bound cells; runs are assigned by position."""
    EPS = 0.5
    hlines = [s for s in segments if abs(s.y0 - s.y1) < EPS]
    vlines = [s for s in segments if abs(s.x0 - s.x1) < EPS]
    if len(hlines) < 2 or len(vlines) < 2:
        return []

    # group vlines by their y-extent overlap into table regions
    regions: list[dict] = []
    for v in vlines:
        lo, hi = min(v.y0, v.y1), max(v.y0, v.y1)
        for reg in regions:
            if lo < reg["top"] + EPS and hi > reg["bot"] - EPS:
                reg["vxs"].append(v.x0)
                reg["bot"] = min(reg["bot"], lo)
                reg["top"] = max(reg["top"], hi)
                break
        else:
            regions.append({"bot": lo, "top": hi, "vxs": [v.x0]})

    tables: list[Grid] = []
    for reg in regions:
        ys = sorted(
            {round(h.y0, 1) for h in hlines if reg["bot"] - EPS <= h.y0 <= reg["top"] + EPS},
            reverse=True,
        )
        xs = sorted(set(round(x, 1) for x in reg["vxs"]))
        if len(ys) < 2 or len(xs) < 2:
            continue
        n_rows, n_cols = len(ys) - 1, len(xs) - 1
        cells: list[list[list[TextRun]]] = [
            [[] for _ in range(n_cols)] for _ in range(n_rows)
        ]
        for r in runs:
            if not (xs[0] <= r.x <= xs[-1] and ys[-1] <= r.y <= ys[0]):
                continue
            ri = next((i for i in range(n_rows) if ys[i] >= r.y > ys[i + 1]), None)
            ci = next((j for j in range(n_cols) if xs[j] <= r.x < xs[j + 1]), None)
            if ri is not None and ci is not None:
                cells[ri][ci].append(r)
        grid: Grid = []
        for ri in range(n_rows):
            row = []
            for ci in range(n_cols):
                parts = sorted(cells[ri][ci], key=lambda t: (-t.y, t.x))
                row.append("\n".join(p.text for p in parts))
            grid.append(row)
        if any(any(c for c in row) for row in grid):
            tables.append(grid)
    return tables


# ---------------------------------------------------------------------------
# front-end entry point
# ---------------------------------------------------------------------------

@dataclass
class ExtractedPdf:
    page_texts: list[str]
    # (grid, page, accuracy)
    lattice_tables: list[tuple[Grid, int, float]] = field(default_factory=list)
    stream_tables_by_config: list[list[tuple[Grid, int, float]]] = field(
        default_factory=list
    )
    spans: list[dict] = field(default_factory=list)


def _accuracy(grid: Grid) -> float:
    total = sum(len(r) for r in grid)
    filled = sum(1 for r in grid for c in r if c)
    return round(100.0 * filled / total, 2) if total else 0.0


def extract_pdf(payload: bytes) -> ExtractedPdf:
    doc = PdfDocument(payload)
    per_page: list[tuple[list[TextRun], list[Segment]]] = []
    for page in doc.pages():
        content = doc.page_content(page)
        per_page.append(interpret_content(content))

    page_texts = [page_text_from_runs(runs) for runs, _ in per_page]

    lattice: list[tuple[Grid, int, float]] = []
    for pno, (runs, segments) in enumerate(per_page, start=1):
        for grid in lattice_tables(runs, segments):
            lattice.append((grid, pno, _accuracy(grid)))

    by_config: list[list[tuple[Grid, int, float]]] = []
    for row_tol, col_tol in STREAM_CONFIGS:
        config_tables: list[tuple[Grid, int, float]] = []
        for pno, (runs, _) in enumerate(per_page, start=1):
            for grid in stream_tables(runs, row_tol, col_tol):
                config_tables.append((grid, pno, _accuracy(grid)))
        by_config.append(config_tables)

    # spans: one span per text line, offsets into the joined page text
    # (pages separated by '\n\f\n' in the result table); kind taxonomy
    # per FIXTURES.md §4, derived from the same line clustering the page
    # text uses: heading = short ALL-CAPS line (KONTAKTER-style section
    # headers), table_field = line with ≥2 positioned runs (the stream
    # profile's table-row criterion), paragraph otherwise
    spans: list[dict] = []
    offset = 0
    for runs, _segments in per_page:
        for line_runs in cluster_lines(runs, row_tol=2.0):
            line = " ".join(r.text for r in line_runs)
            if line:
                if len(line) < 40 and line.isupper():
                    kind = "heading"
                elif len(line_runs) >= 2:
                    kind = "table_field"
                else:
                    kind = "paragraph"
                spans.append(
                    {"kind": kind, "start": offset, "end": offset + len(line), "text": line}
                )
            offset += len(line) + 1
        offset += 2  # '\f\n' of the page separator minus counted '\n'

    return ExtractedPdf(
        page_texts=page_texts,
        lattice_tables=lattice,
        stream_tables_by_config=by_config,
        spans=spans,
    )
