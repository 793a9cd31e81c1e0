"""Deterministic fixture PDF writer (FIXTURES.md §1b).

Renders a DocSpec to real PDF bytes using only the stdlib — no external
PDF library.  The emitted feature set *defines* the scope of the
from-scratch reader (SURVEY.md §2.9):

  * classic xref tables AND cross-reference streams with /ObjStm object
    streams (alternating per document index so both paths stay tested);
  * raw and FlateDecode content streams;
  * text operators: BT/ET, Tf, Td, TD, TL, T*, Tm, Tj, TJ and ';
  * literal strings (with escapes) and hex strings (UTF-8 bytes — the
    writer/reader convention for Danish æøå and '✓');
  * path operators m/l/S drawing ruling lines around "lattice" tables;
    "stream" tables are positioned text runs only.

Layout model: y grows downward from 800; each text line is one or more
runs at explicit coordinates so positional clustering in the reader is
exercised honestly.
"""

from __future__ import annotations

import random
import zlib

from .corpus import DocSpec

PAGE_W, PAGE_H = 595, 842
TOP_Y = 800
LINE_H = 14
LEFT_X = 40

# column x positions for tables (up to 7 columns)
_COL_X = [40, 90, 240, 330, 420, 480, 540]
_COL_X_WIDE = [40, 75, 200, 300, 380, 450, 510]


def _esc_literal(data: bytes) -> bytes:
    return (
        data.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _pdf_string(text: str, hexmode: bool) -> bytes:
    raw = text.encode("utf-8")
    if hexmode:
        return b"<" + raw.hex().encode("ascii") + b">"
    return b"(" + _esc_literal(raw) + b")"


class _ContentBuilder:
    """Accumulates one page's content stream, rotating through the text
    operator repertoire deterministically."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.text_ops: list[bytes] = [b"/F1 11 Tf", b"%d TL" % LINE_H]
        self.path_ops: list[bytes] = []
        self._mode = 0
        self._cursor: tuple[float, float] | None = None  # current line origin
        self._leading = float(LINE_H)

    def text_at(self, x: float, y: float, text: str) -> None:
        mode = self._mode % 5
        self._mode += 1
        s = _pdf_string(text, hexmode=(self._mode % 3 == 0))
        if mode == 0 or self._cursor is None:
            self.text_ops.append(b"1 0 0 1 %.1f %.1f Tm" % (x, y))
            self.text_ops.append(s + b" Tj")
        elif mode == 1:
            dx, dy = x - self._cursor[0], y - self._cursor[1]
            self.text_ops.append(b"%.1f %.1f Td" % (dx, dy))
            self.text_ops.append(s + b" Tj")
        elif mode == 2:
            dx, dy = x - self._cursor[0], y - self._cursor[1]
            self.text_ops.append(b"%.1f %.1f TD" % (dx, dy))
            self.text_ops.append(s + b" Tj")
            self._leading = -dy  # TD sets leading to -ty (PDF 32000 §9.4.2)
        elif mode == 3:
            self.text_ops.append(b"1 0 0 1 %.1f %.1f Tm" % (x, y))
            self.text_ops.append(b"[" + s + b" -20] TJ")
        else:
            # ' = T* then show; only valid when the target sits exactly one
            # leading below the current line origin at the same x
            if (
                abs(x - self._cursor[0]) < 0.01
                and abs((self._cursor[1] - self._leading) - y) < 0.01
            ):
                self.text_ops.append(s + b" '")
            else:
                self.text_ops.append(b"1 0 0 1 %.1f %.1f Tm" % (x, y))
                self.text_ops.append(s + b" Tj")
        self._cursor = (x, y)

    def hline(self, x0: float, x1: float, y: float) -> None:
        self.path_ops.append(b"%.1f %.1f m %.1f %.1f l S" % (x0, y, x1, y))

    def vline(self, x: float, y0: float, y1: float) -> None:
        self.path_ops.append(b"%.1f %.1f m %.1f %.1f l S" % (x, y0, x, y1))

    def build(self) -> bytes:
        return b"\n".join(self.path_ops + [b"BT"] + self.text_ops + [b"ET"])


def _layout_pages(spec: DocSpec, rng: random.Random) -> list[tuple[bytes, list]]:
    """Returns [(content_stream, ruled_tables_meta)] per page."""
    pages: list[tuple[bytes, list]] = []

    cb = _ContentBuilder(rng)
    y = TOP_Y
    ruled_meta: list = []

    def new_page():
        nonlocal cb, y, ruled_meta
        pages.append((cb.build(), ruled_meta))
        cb = _ContentBuilder(rng)
        y = TOP_Y
        ruled_meta = []

    def ensure(lines_needed: int):
        nonlocal y
        if y - lines_needed * LINE_H < 40:
            new_page()

    for line in spec.company_lines + spec.paragraphs:
        ensure(1)
        cb.text_at(LEFT_X, y, line)
        y -= LINE_H

    for line in spec.section_lines:
        ensure(1)
        cb.text_at(LEFT_X, y, line)
        y -= LINE_H

    for grid in spec.tables:
        n_cols = max(len(r) for r in grid)
        cols = (_COL_X if n_cols <= 5 else _COL_X_WIDE)[:n_cols]
        ruled = rng.random() < 0.5
        # account for multi-line cells
        row_heights = [
            max((str(c).count("\n") if c else 0) for c in row) + 1 for row in grid
        ]
        total = sum(row_heights) + 1
        ensure(total + 1)
        y -= LINE_H  # spacing before table
        table_top = y + LINE_H - 4
        row_ys: list[float] = []
        for row, rh in zip(grid, row_heights):
            row_ys.append(y)
            for ci, cell in enumerate(row):
                if cell:
                    for k, part in enumerate(str(cell).split("\n")):
                        if part:
                            cb.text_at(cols[ci], y - k * LINE_H, part)
            y -= rh * LINE_H
        table_bottom = y + LINE_H - 6
        if ruled:
            x_end = cols[-1] + 50
            cb.hline(cols[0] - 4, x_end, table_top)
            for ry in row_ys[1:]:
                cb.hline(cols[0] - 4, x_end, ry + LINE_H - 4)
            cb.hline(cols[0] - 4, x_end, table_bottom)
            for cx in cols:
                cb.vline(cx - 4, table_bottom, table_top)
            cb.vline(x_end, table_bottom, table_top)
        y -= LINE_H

    new_page()
    return pages


# ---------------------------------------------------------------------------
# document assembly: classic xref vs xref-stream + ObjStm
# ---------------------------------------------------------------------------

def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num: int, dict_extra: bytes, data: bytes, compress: bool) -> bytes:
    if compress:
        data = zlib.compress(data)
        filt = b"/Filter /FlateDecode "
    else:
        filt = b""
    d = b"<< " + dict_extra + filt + b"/Length %d >>" % len(data)
    return _obj(num, d + b"\nstream\n" + data + b"\nendstream")


def render_pdf(spec: DocSpec) -> bytes:
    rng = random.Random(f"pex2pdf:{spec.idx}")
    pages = _layout_pages(spec, rng)
    compress = spec.idx % 2 == 1
    use_xref_stream = spec.idx % 2 == 1

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages-tree, 3 font,
    # 4..3+n page objects, then content streams
    first_page_obj = 4
    first_content_obj = first_page_obj + n_pages

    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % (first_page_obj + i) for i in range(n_pages))
    objects[2] = (
        b"<< /Type /Pages /Count %d /Kids [ " % n_pages + kids + b" ] >>"
    )
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i in range(n_pages):
        objects[first_page_obj + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 %d %d ] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, first_content_obj + i)
        )

    out = bytearray()
    out += b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"

    offsets: dict[int, int] = {}

    if not use_xref_stream:
        # classic xref: all objects written directly
        for num in sorted(objects):
            offsets[num] = len(out)
            out += _obj(num, objects[num])
        for i in range(n_pages):
            num = first_content_obj + i
            offsets[num] = len(out)
            out += _stream_obj(num, b"", pages[i][0], compress)
        maxnum = first_content_obj + n_pages - 1
        xref_pos = len(out)
        out += b"xref\n0 %d\n" % (maxnum + 1)
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            out += b"%010d 00000 n \n" % offsets[num]
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (maxnum + 1, xref_pos)
        )
        return bytes(out)

    # xref-stream variant: non-stream objects packed into one /ObjStm
    objstm_num = first_content_obj + n_pages
    xref_num = objstm_num + 1

    # content streams are regular (type-1) entries
    for i in range(n_pages):
        num = first_content_obj + i
        offsets[num] = len(out)
        out += _stream_obj(num, b"", pages[i][0], compress)

    # pack catalog/pages/font/page-dicts into the object stream
    packed = sorted(objects)
    header_parts: list[bytes] = []
    body = bytearray()
    for num in packed:
        header_parts.append(b"%d %d" % (num, len(body)))
        body += objects[num] + b"\n"
    header = b" ".join(header_parts) + b"\n"
    objstm_data = header + bytes(body)
    offsets[objstm_num] = len(out)
    out += _stream_obj(
        objstm_num,
        b"/Type /ObjStm /N %d /First %d " % (len(packed), len(header)),
        objstm_data,
        compress=True,
    )

    # xref stream (type-0 free, type-1 offset, type-2 in-objstm), W=[1 4 2]
    xref_pos = len(out)
    maxnum = xref_num
    rows = bytearray()

    def xrow(t: int, f2: int, f3: int) -> None:
        rows.extend(bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big"))

    xrow(0, 0, 65535)
    for num in range(1, maxnum + 1):
        if num in offsets:
            xrow(1, offsets[num], 0)
        elif num in objects:
            xrow(2, objstm_num, packed.index(num))
        else:
            xrow(0, 0, 0)
    offsets[xref_num] = xref_pos
    # the xref stream's own entry is type 1 at xref_pos: rebuild last row
    rows = rows[:-7] + bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    out += _stream_obj(
        xref_num,
        b"/Type /XRef /Size %d /W [ 1 4 2 ] /Root 1 0 R " % (maxnum + 1),
        bytes(rows),
        compress=True,
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
