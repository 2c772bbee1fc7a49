"""Dependency-free SVG chart primitives.

The reference renders its diagnostics with matplotlib/seaborn
(didtool/metric.py:313-756, didtool/selector.py:285-418). This
container has neither, and a 100 TB pipeline's driver should not need a
GUI stack to emit a diagnostic artifact — so the chart layer is a small
pure-Python SVG writer. Every didtool plot is either a line chart, a
bar chart, a histogram, or a heatmap; these four primitives (plus a
shared axis/tick/legend frame) cover all of them. The numeric work
(curves, pivots, histograms) stays in the distributed operators; this
module only maps already-small driver-side tables to <polyline>/<rect>
elements.

Output is a self-contained SVG string; ``save()`` writes it under an
output directory the way the reference's ``out_path``/``file_name``
pair does.
"""

from __future__ import annotations

import math
import os
from xml.sax.saxutils import escape

# Okabe-Ito colorblind-safe cycle.
PALETTE = [
    "#0072B2", "#D55E00", "#009E73", "#CC79A7",
    "#E69F00", "#56B4E9", "#F0E442", "#000000",
]

_FONT = "font-family='Helvetica,Arial,sans-serif'"


def _fmt(v: float) -> str:
    """Short tick label: trims trailing zeros, keeps small magnitudes."""
    if v == 0:
        return "0"
    if abs(v) >= 1000 or abs(v) < 0.001:
        return f"{v:.1e}"
    s = f"{v:.3f}".rstrip("0").rstrip(".")
    return s if s else "0"


def _ticks(lo: float, hi: float, n: int = 6) -> list[float]:
    """~n 'nice' tick positions covering [lo, hi]."""
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n - 1, 1)
    # subnormal/degenerate spans (hi - lo underflows): ticks at the ends
    if not (raw > 0.0) or not math.isfinite(raw) or raw < 1e-300:
        return [lo, hi]
    mag = 10 ** math.floor(math.log10(raw))
    for mult in (1, 2, 2.5, 5, 10):
        if mult * mag >= raw:
            step = mult * mag
            break
    first = math.ceil(lo / step) * step
    out = []
    t = first
    while t <= hi + step * 1e-9:
        out.append(round(t, 10))
        t += step
    return out or [lo, hi]


class Frame:
    """Shared chart frame: margins, scales, axes, title, legend."""

    def __init__(
        self, width: int, height: int, xlim: tuple[float, float],
        ylim: tuple[float, float], title: str = "", xlabel: str = "",
        ylabel: str = "",
    ):
        self.w, self.h = width, height
        self.ml, self.mr, self.mt, self.mb = 62, 16, 34, 46
        if xlim[1] <= xlim[0]:
            xlim = (xlim[0], xlim[0] + 1.0)
        if ylim[1] <= ylim[0]:
            ylim = (ylim[0], ylim[0] + 1.0)
        self.xlim, self.ylim = xlim, ylim
        self.title, self.xlabel, self.ylabel = title, xlabel, ylabel
        # heatmaps/bars label their categorical axis directly
        self.show_xticks = True
        self.show_yticks = True
        self.parts: list[str] = []

    # plot-area pixel box
    @property
    def px0(self) -> float:
        return self.ml

    @property
    def px1(self) -> float:
        return self.w - self.mr

    @property
    def py0(self) -> float:
        return self.mt

    @property
    def py1(self) -> float:
        return self.h - self.mb

    def sx(self, x: float) -> float:
        f = (x - self.xlim[0]) / (self.xlim[1] - self.xlim[0])
        return self.px0 + f * (self.px1 - self.px0)

    def sy(self, y: float) -> float:
        f = (y - self.ylim[0]) / (self.ylim[1] - self.ylim[0])
        return self.py1 - f * (self.py1 - self.py0)

    def _frame_parts(self) -> list[str]:
        p = [
            f"<rect x='{self.px0}' y='{self.py0}' "
            f"width='{self.px1 - self.px0}' height='{self.py1 - self.py0}' "
            "fill='white' stroke='#444' stroke-width='1'/>"
        ]
        for t in _ticks(*self.xlim) if self.show_xticks else []:
            if not (self.xlim[0] - 1e-12 <= t <= self.xlim[1] + 1e-12):
                continue
            x = self.sx(t)
            p.append(
                f"<line x1='{x:.1f}' y1='{self.py0}' x2='{x:.1f}' "
                f"y2='{self.py1}' stroke='#ddd' stroke-width='0.5'/>"
            )
            p.append(
                f"<text x='{x:.1f}' y='{self.py1 + 16}' {_FONT} "
                f"font-size='11' text-anchor='middle'>{_fmt(t)}</text>"
            )
        for t in _ticks(*self.ylim) if self.show_yticks else []:
            if not (self.ylim[0] - 1e-12 <= t <= self.ylim[1] + 1e-12):
                continue
            y = self.sy(t)
            p.append(
                f"<line x1='{self.px0}' y1='{y:.1f}' x2='{self.px1}' "
                f"y2='{y:.1f}' stroke='#ddd' stroke-width='0.5'/>"
            )
            p.append(
                f"<text x='{self.px0 - 6}' y='{y + 4:.1f}' {_FONT} "
                f"font-size='11' text-anchor='end'>{_fmt(t)}</text>"
            )
        if self.title:
            p.append(
                f"<text x='{self.w / 2}' y='{self.mt - 12}' {_FONT} "
                f"font-size='14' text-anchor='middle' font-weight='bold'>"
                f"{escape(self.title)}</text>"
            )
        if self.xlabel:
            p.append(
                f"<text x='{(self.px0 + self.px1) / 2}' y='{self.h - 10}' "
                f"{_FONT} font-size='12' text-anchor='middle'>"
                f"{escape(self.xlabel)}</text>"
            )
        if self.ylabel:
            cy = (self.py0 + self.py1) / 2
            p.append(
                f"<text x='14' y='{cy}' {_FONT} font-size='12' "
                f"text-anchor='middle' transform='rotate(-90 14 {cy})'>"
                f"{escape(self.ylabel)}</text>"
            )
        return p

    def add_legend(self, entries: list[tuple[str, str]]) -> None:
        """entries: (label, color); drawn top-left inside the plot box."""
        if not entries:
            return
        x, y = self.px0 + 10, self.py0 + 10
        wbox = max(len(lbl) for lbl, _ in entries) * 6.6 + 34
        hbox = 16 * len(entries) + 8
        self.parts.append(
            f"<rect x='{x}' y='{y}' width='{wbox:.0f}' height='{hbox}' "
            "fill='white' fill-opacity='0.85' stroke='#999'/>"
        )
        for i, (lbl, color) in enumerate(entries):
            yy = y + 14 + 16 * i
            self.parts.append(
                f"<line x1='{x + 6}' y1='{yy - 4}' x2='{x + 24}' "
                f"y2='{yy - 4}' stroke='{color}' stroke-width='2'/>"
            )
            self.parts.append(
                f"<text x='{x + 28}' y='{yy}' {_FONT} font-size='11'>"
                f"{escape(lbl)}</text>"
            )

    def render(self) -> str:
        body = "\n".join(self._frame_parts() + self.parts)
        return (
            f"<svg xmlns='http://www.w3.org/2000/svg' width='{self.w}' "
            f"height='{self.h}' viewBox='0 0 {self.w} {self.h}'>\n"
            f"<rect width='{self.w}' height='{self.h}' fill='white'/>\n"
            f"{body}\n</svg>\n"
        )


def _clipped_points(frame: Frame, xs, ys) -> str:
    pts = []
    for x, y in zip(xs, ys):
        if x is None or y is None:
            continue
        fx, fy = float(x), float(y)
        if math.isnan(fx) or math.isnan(fy):
            continue
        pts.append(f"{frame.sx(fx):.2f},{frame.sy(fy):.2f}")
    return " ".join(pts)


def line_chart(
    series: list[dict], title: str = "", xlabel: str = "", ylabel: str = "",
    xlim: tuple[float, float] | None = None,
    ylim: tuple[float, float] | None = None,
    diagonal: bool = False, width: int = 560, height: int = 560,
    legend: bool = True,
) -> str:
    """series: [{'name', 'x', 'y', 'color'?, 'dashed'?}, ...]."""
    xs_all = [float(v) for s in series for v in s["x"] if v is not None]
    ys_all = [
        float(v) for s in series for v in s["y"]
        if v is not None and not math.isnan(float(v))
    ]
    if xlim is None:
        xlim = (min(xs_all, default=0.0), max(xs_all, default=1.0))
    if ylim is None:
        lo, hi = min(ys_all, default=0.0), max(ys_all, default=1.0)
        pad = 0.05 * (hi - lo or 1.0)
        ylim = (lo - pad, hi + pad)
    f = Frame(width, height, xlim, ylim, title, xlabel, ylabel)
    if diagonal:
        f.parts.append(
            f"<line x1='{f.sx(xlim[0]):.1f}' y1='{f.sy(xlim[0]):.1f}' "
            f"x2='{f.sx(xlim[1]):.1f}' y2='{f.sy(xlim[1]):.1f}' "
            "stroke='#777' stroke-width='1' stroke-dasharray='5,4'/>"
        )
    entries = []
    for i, s in enumerate(series):
        color = s.get("color") or PALETTE[i % len(PALETTE)]
        dash = " stroke-dasharray='5,4'" if s.get("dashed") else ""
        pts = _clipped_points(f, s["x"], s["y"])
        if pts:
            f.parts.append(
                f"<polyline points='{pts}' fill='none' stroke='{color}' "
                f"stroke-width='1.5'{dash}/>"
            )
        entries.append((s["name"], color))
    if legend and len(series) > 1:
        f.add_legend(entries)
    return f.render()


def bar_chart(
    labels: list[str], values: list[float], title: str = "",
    xlabel: str = "", ylabel: str = "", horizontal: bool = False,
    color: str = PALETTE[0], width: int = 640, height: int = 480,
) -> str:
    """Categorical bars; horizontal=True puts labels on the y axis (the
    reference's barh layout for IV / importance rankings)."""
    n = max(len(values), 1)
    vmax = max([float(v) for v in values] + [0.0])
    vmin = min([float(v) for v in values] + [0.0])
    if horizontal:
        f = Frame(width, height, (min(vmin, 0.0), vmax * 1.05 or 1.0),
                  (0.0, float(n)), title, xlabel, ylabel)
        f.ml = max(f.ml, 10 + int(max((len(x) for x in labels), default=0) * 6.6))
        f.show_yticks = False
        band = (f.py1 - f.py0) / n
        for i, (lbl, v) in enumerate(zip(labels, values)):
            # first label on top
            y = f.py0 + i * band + band * 0.12
            x0 = f.sx(min(0.0, float(v)))
            wpx = abs(f.sx(float(v)) - f.sx(0.0))
            f.parts.append(
                f"<rect x='{x0:.1f}' y='{y:.1f}' width='{wpx:.1f}' "
                f"height='{band * 0.76:.1f}' fill='{color}' stroke='#333' "
                "stroke-width='0.6'/>"
            )
            f.parts.append(
                f"<text x='{f.px0 - 6}' y='{y + band * 0.5:.1f}' {_FONT} "
                f"font-size='11' text-anchor='end'>{escape(str(lbl))}</text>"
            )
        return f.render()
    f = Frame(width, height, (0.0, float(n)), (min(vmin, 0.0), vmax * 1.05 or 1.0),
              title, xlabel, ylabel)
    f.show_xticks = False
    band = (f.px1 - f.px0) / n
    for i, (lbl, v) in enumerate(zip(labels, values)):
        x = f.px0 + i * band + band * 0.12
        y1 = f.sy(max(0.0, float(v)))
        hpx = abs(f.sy(float(v)) - f.sy(0.0))
        f.parts.append(
            f"<rect x='{x:.1f}' y='{y1:.1f}' width='{band * 0.76:.1f}' "
            f"height='{hpx:.1f}' fill='{color}' stroke='#333' "
            "stroke-width='0.6'/>"
        )
        f.parts.append(
            f"<text x='{x + band * 0.38:.1f}' y='{f.py1 + 16}' {_FONT} "
            f"font-size='10' text-anchor='middle'>{escape(str(lbl))}</text>"
        )
    return f.render()


def grouped_bar_chart(
    labels: list[str], series: list[dict], title: str = "",
    xlabel: str = "", ylabel: str = "", width: int = 640, height: int = 480,
) -> str:
    """Side-by-side bars per category: series = [{'name', 'values',
    'color'?}, ...] with len(values) == len(labels)."""
    n, k = max(len(labels), 1), max(len(series), 1)
    vmax = max(
        (float(v) for s in series for v in s["values"]), default=1.0
    )
    f = Frame(width, height, (0.0, float(n)), (0.0, vmax * 1.05 or 1.0),
              title, xlabel, ylabel)
    f.show_xticks = False
    band = (f.px1 - f.px0) / n
    bar_w = band * 0.76 / k
    entries = []
    for si, s in enumerate(series):
        color = s.get("color") or PALETTE[si % len(PALETTE)]
        entries.append((s["name"], color))
        for i, v in enumerate(s["values"]):
            x = f.px0 + i * band + band * 0.12 + si * bar_w
            y1 = f.sy(float(v))
            f.parts.append(
                f"<rect x='{x:.1f}' y='{y1:.1f}' width='{bar_w:.1f}' "
                f"height='{f.py1 - y1:.1f}' fill='{color}' "
                "fill-opacity='0.85' stroke='#333' stroke-width='0.5'/>"
            )
    for i, lbl in enumerate(labels):
        x = f.px0 + (i + 0.5) * band
        f.parts.append(
            f"<text x='{x:.1f}' y='{f.py1 + 14}' {_FONT} font-size='10' "
            f"text-anchor='end' transform='rotate(-30 {x:.1f} {f.py1 + 14})'>"
            f"{escape(str(lbl))}</text>"
        )
    f.add_legend(entries)
    return f.render()


def histogram(
    edges: list[float], counts: list[float], title: str = "",
    xlabel: str = "", ylabel: str = "Count", color: str = "#D55E00",
    width: int = 560, height: int = 420,
) -> str:
    """len(edges) == len(counts) + 1 — contiguous numeric bins."""
    vmax = max([float(c) for c in counts] + [1.0])
    f = Frame(width, height, (float(edges[0]), float(edges[-1])),
              (0.0, vmax * 1.05), title, xlabel, ylabel)
    for i, c in enumerate(counts):
        x0, x1 = f.sx(float(edges[i])), f.sx(float(edges[i + 1]))
        y = f.sy(float(c))
        f.parts.append(
            f"<rect x='{x0:.1f}' y='{y:.1f}' width='{x1 - x0:.1f}' "
            f"height='{f.py1 - y:.1f}' fill='{color}' fill-opacity='0.8' "
            "stroke='#333' stroke-width='0.8'/>"
        )
    return f.render()


def _diverging_color(v: float, vmin: float, vmax: float) -> str:
    """White at 0, blue toward vmin, red toward vmax (corr heatmaps)."""
    span = max(abs(vmin), abs(vmax)) or 1.0
    t = max(-1.0, min(1.0, float(v) / span))
    if t >= 0:
        g = int(255 * (1 - t))
        return f"rgb(255,{g},{g})"
    g = int(255 * (1 + t))
    return f"rgb({g},{g},255)"


def heatmap(
    matrix, row_labels: list[str], col_labels: list[str], title: str = "",
    annotate: bool = True, width: int = 640, height: int = 560,
) -> str:
    """matrix: rows x cols of floats (NaN cells left blank)."""
    nr, nc = len(row_labels), len(col_labels)
    f = Frame(width, height, (0.0, float(max(nc, 1))),
              (0.0, float(max(nr, 1))), title)
    f.show_xticks = f.show_yticks = False
    f.ml = max(f.ml, 10 + int(max((len(x) for x in row_labels), default=0) * 6.6))
    f.mb = 20 + int(max((len(x) for x in col_labels), default=0) * 5.0)
    flat = [
        float(v) for row in matrix for v in row
        if v is not None and not math.isnan(float(v))
    ]
    vmin, vmax = min(flat, default=-1.0), max(flat, default=1.0)
    cw = (f.px1 - f.px0) / max(nc, 1)
    ch = (f.py1 - f.py0) / max(nr, 1)
    for i in range(nr):
        for j in range(nc):
            v = matrix[i][j]
            if v is None or math.isnan(float(v)):
                continue
            x, y = f.px0 + j * cw, f.py0 + i * ch
            f.parts.append(
                f"<rect x='{x:.1f}' y='{y:.1f}' width='{cw:.1f}' "
                f"height='{ch:.1f}' fill='{_diverging_color(v, vmin, vmax)}' "
                "stroke='#ccc' stroke-width='0.5'/>"
            )
            if annotate and nc <= 20:
                f.parts.append(
                    f"<text x='{x + cw / 2:.1f}' y='{y + ch / 2 + 4:.1f}' "
                    f"{_FONT} font-size='10' text-anchor='middle'>"
                    f"{_fmt(float(v))}</text>"
                )
    for i, lbl in enumerate(row_labels):
        f.parts.append(
            f"<text x='{f.px0 - 6}' y='{f.py0 + (i + 0.5) * ch + 4:.1f}' "
            f"{_FONT} font-size='11' text-anchor='end'>{escape(str(lbl))}</text>"
        )
    for j, lbl in enumerate(col_labels):
        x = f.px0 + (j + 0.5) * cw
        y = f.py1 + 12
        f.parts.append(
            f"<text x='{x:.1f}' y='{y}' {_FONT} font-size='11' "
            f"text-anchor='end' transform='rotate(-45 {x:.1f} {y})'>"
            f"{escape(str(lbl))}</text>"
        )
    return f.render()


def save(svg: str, out_path: str, file_name: str) -> str:
    """Mirror the reference's (out_path, file_name) save contract."""
    os.makedirs(out_path, exist_ok=True)
    full = os.path.join(out_path, file_name)
    with open(full, "w") as fh:
        fh.write(svg)
    return full
