"""PDF report artifact — the reference's report generator at the
presentation edge (reference report_generator.py:38-55 cover page,
58-121 body with summary paragraphs + top-20 table, 124-154 build;
the ``date.today()`` stamp is report_generator.py:52).

The reference uses reportlab + pypdf; neither exists here, so this
writes a minimal valid PDF by hand (text-only: PDF 1.4, Type1
Helvetica, one content stream per page, correct xref offsets — all
public file-format knowledge).  Like the chart, it only ever renders
already-collected driver-side scalars and a ≤20-row table slice
(reference cap, report_generator.py:78): the engine supplies the
aggregates, the edge just formats them.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

_LINES_PER_PAGE = 54
_FONT_SIZE = 11
_LEADING = 13


def _pdf_escape(s: str) -> str:
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )


def _page_stream(lines: Sequence[str]) -> bytes:
    parts = [f"BT /F1 {_FONT_SIZE} Tf 72 720 Td {_LEADING} TL"]
    for i, line in enumerate(lines):
        text = _pdf_escape(line).encode("latin-1", "replace").decode("latin-1")
        parts.append(("T* " if i else "") + f"({text}) Tj")
    parts.append("ET")
    return "\n".join(parts).encode("latin-1")


def render_pdf(lines: Sequence[str]) -> bytes:
    """Render text lines into a single minimal PDF (paginated)."""
    pages = [
        list(lines[i : i + _LINES_PER_PAGE])
        for i in range(0, max(len(lines), 1), _LINES_PER_PAGE)
    ] or [[]]
    return render_pdf_pages(pages)


def render_pdf_pages(pages: Sequence[Sequence[str]]) -> bytes:
    """Render explicit pages (cover + body) into one minimal PDF —
    the hand-built analogue of the reference's pypdf cover/body merge
    (report_generator.py:147-153)."""
    pages = [list(p) for p in pages] or [[]]

    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # (page obj, contents obj)
    objs: list[bytes] = []
    page_ids = [4 + 2 * i for i in range(len(pages))]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for pid, page_lines in zip(page_ids, pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {pid + 1} 0 R >>"
            ).encode()
        )
        stream = _page_stream(page_lines)
        objs.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def cover_lines(
    title: str,
    subtitle: str = "",
    context: Sequence[str] = (),
    today: _dt.date | None = None,
) -> list[str]:
    """Compose the reference cover page (report_generator.py:38-55):
    vertical offset, report title, subtitle, context lines (the
    reference shows Country/Antigen), and the generated-on stamp."""
    today = today or _dt.date.today()
    lines = ["" for _ in range(6)]  # ~1.1in spacer at 13pt leading
    lines.append(title)
    lines.append("")
    if subtitle:
        lines += [subtitle, ""]
    lines += list(context)
    lines.append(f"Generated on: {today.isoformat()}")
    return lines


def report_lines(
    title: str,
    summary: Sequence[str],
    table_rows: Sequence[tuple] = (),
    table_header: Sequence[str] = (),
    today: _dt.date | None = None,
) -> list[str]:
    """Compose the reference report layout as text lines: title +
    generated-date stamp (report_generator.py:52) + summary paragraphs
    + a top-20 table (cap per report_generator.py:78)."""
    today = today or _dt.date.today()
    lines = [title, f"Generated: {today.isoformat()}", ""]
    lines += list(summary)
    if len(table_rows) > 0:
        lines.append("")
        if table_header:
            lines.append("  ".join(str(h) for h in table_header))
            lines.append("-" * min(72, 2 + 12 * len(table_header)))
        for row in list(table_rows)[:20]:
            lines.append("  ".join(str(v) for v in row))
    return lines


def save_pdf_report(
    path: str,
    title: str,
    summary: Sequence[str],
    table_rows: Sequence[tuple] = (),
    table_header: Sequence[str] = (),
    today: _dt.date | None = None,
    cover_subtitle: str = "",
    cover_context: Sequence[str] = (),
) -> str:
    """Two-page-minimum output matching the reference shape: a dedicated
    cover page (report_generator.py:38-55) followed by the body pages
    (summary + top-20 table), merged into one document the way the
    reference merges cover and body PDFs (report_generator.py:147-153).
    """
    cover = cover_lines(title, cover_subtitle, cover_context, today)
    body = report_lines(title, summary, table_rows, table_header, today)
    body_pages = [
        body[i : i + _LINES_PER_PAGE]
        for i in range(0, max(len(body), 1), _LINES_PER_PAGE)
    ] or [[]]
    with open(path, "wb") as fh:
        fh.write(render_pdf_pages([cover, *body_pages]))
    return path
