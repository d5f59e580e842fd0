"""Series chart artifact — the reference's PNG plot at the
presentation edge (reference etl_pipeline.py:157-172: matplotlib line
plot of the coverage series with a campaign-year marker, saved next to
the CSV artifact).

This environment has no matplotlib, so the default artifact is a
dependency-free SVG rendered by hand (same marks: line + point markers
+ dashed campaign marker + title/axis labels).  When matplotlib IS
importable the same call yields the reference-style PNG instead.  Only
ever invoked on an already-collected, driver-side series (≤ ~45 rows
per the reference working set) — never inside a distributed plan.
"""

from __future__ import annotations

import html
from collections.abc import Sequence

try:  # pragma: no cover - matplotlib absent in this environment
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except Exception:  # noqa: BLE001
    _HAVE_MPL = False


def _svg_chart(
    points: Sequence[tuple[float, float]],
    title: str,
    campaign_year: float | None,
    width: int,
    height: int,
    windows: Sequence[tuple[float, float, str]] | None = None,
) -> str:
    """``windows``: optional shaded x-ranges (x_from, x_to, css_color) —
    the before/after campaign vrects of the reference dashboard
    (reference streamlit_app.py:254-308)."""
    ml, mr, mt, mb = 56, 16, 40, 44  # margins
    pw, ph = width - ml - mr, height - mt - mb
    xs = [float(p[0]) for p in points]
    ys = [float(p[1]) for p in points]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    if x1 == x0:
        x0, x1 = x0 - 0.5, x1 + 0.5
    if y1 == y0:
        y0, y1 = y0 - 1.0, y1 + 1.0
    # pad the value range 5% so the line doesn't hug the frame
    pad = 0.05 * (y1 - y0)
    y0, y1 = y0 - pad, y1 + pad

    def sx(x: float) -> float:
        return ml + (x - x0) / (x1 - x0) * pw

    def sy(y: float) -> float:
        return mt + ph - (y - y0) / (y1 - y0) * ph

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.1f}" y="22" text-anchor="middle" '
        f'font-family="sans-serif" font-size="14" font-weight="bold">'
        f"{html.escape(title)}</text>",
        # frame
        f'<rect x="{ml}" y="{mt}" width="{pw}" height="{ph}" fill="none" '
        'stroke="#888" stroke-width="1"/>',
    ]
    # shaded campaign windows (behind gridlines and the series)
    for wx0, wx1, color in windows or ():
        cx0, cx1 = max(float(wx0), x0), min(float(wx1), x1)
        if cx1 <= cx0:
            continue
        parts.append(
            f'<rect x="{sx(cx0):.1f}" y="{mt}" '
            f'width="{sx(cx1) - sx(cx0):.1f}" height="{ph}" '
            f'fill="{color}" fill-opacity="0.15"/>'
        )
    # y gridlines + labels (4 ticks)
    for i in range(5):
        yv = y0 + (y1 - y0) * i / 4
        yy = sy(yv)
        parts.append(
            f'<line x1="{ml}" y1="{yy:.1f}" x2="{ml + pw}" y2="{yy:.1f}" '
            'stroke="#ddd" stroke-width="0.5"/>'
        )
        parts.append(
            f'<text x="{ml - 6}" y="{yy + 4:.1f}" text-anchor="end" '
            f'font-family="sans-serif" font-size="10">{yv:.1f}</text>'
        )
    # x labels: first, middle, last
    for xv in {x0, (x0 + x1) / 2, x1}:
        parts.append(
            f'<text x="{sx(xv):.1f}" y="{mt + ph + 16}" text-anchor="middle" '
            f'font-family="sans-serif" font-size="10">{xv:.0f}</text>'
        )
    # campaign marker
    if campaign_year is not None and x0 <= campaign_year <= x1:
        cx = sx(campaign_year)
        parts.append(
            f'<line x1="{cx:.1f}" y1="{mt}" x2="{cx:.1f}" y2="{mt + ph}" '
            'stroke="#c0392b" stroke-width="1.5" stroke-dasharray="5,4"/>'
        )
        parts.append(
            f'<text x="{cx + 4:.1f}" y="{mt + 12}" font-family="sans-serif" '
            f'font-size="10" fill="#c0392b">campaign {campaign_year:.0f}</text>'
        )
    # the series line + markers
    pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys))
    parts.append(
        f'<polyline points="{pts}" fill="none" stroke="#2c6fbb" stroke-width="2"/>'
    )
    for x, y in zip(xs, ys):
        parts.append(
            f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="2.5" fill="#2c6fbb"/>'
        )
    parts.append(
        f'<text x="{width / 2:.1f}" y="{height - 8}" text-anchor="middle" '
        'font-family="sans-serif" font-size="11">year</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def save_series_chart(
    points: Sequence[tuple[float, float]],
    path_base: str,
    title: str = "",
    campaign_year: float | None = None,
    width: int = 640,
    height: int = 400,
) -> str:
    """Save the series chart; returns the path actually written.

    ``path_base`` carries no extension — ``.png`` (matplotlib) or
    ``.svg`` (fallback renderer) is appended here.  Raises ValueError
    on an empty series (callers guard with the nonempty check first).
    """
    if not points:
        raise ValueError("cannot chart an empty series")
    points = sorted((float(x), float(y)) for x, y in points)
    if _HAVE_MPL:  # pragma: no cover - absent in this environment
        fig, ax = plt.subplots(figsize=(width / 100, height / 100))
        ax.plot([p[0] for p in points], [p[1] for p in points], marker="o")
        if campaign_year is not None:
            ax.axvline(campaign_year, color="red", linestyle="--", alpha=0.7)
        ax.set_title(title)
        ax.set_xlabel("year")
        ax.set_ylabel("coverage (%)")
        out = path_base + ".png"
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out
    out = path_base + ".svg"
    with open(out, "w", encoding="utf-8") as fh:
        fh.write(_svg_chart(points, title, campaign_year, width, height))
    return out
