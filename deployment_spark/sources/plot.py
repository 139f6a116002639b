"""S10 — plot sink, dependency-free (SURVEY §2.13).

The reference renders a 3-panel matplotlib figure per model — execution
time / CPU / memory vs operation size, one line per operation type —
and saves it next to the metrics CSV
(``FAISS/PlainDemo/pipeline.py:183-230``: ``plot_performance_metrics``,
subplots 1-3, suptitle ``f"Performance Metrics for {model_name}"``).
matplotlib is not in this environment, and a plot is not a distributed
computation anyway — so the sink renders the same three panels as a
plain SVG document (XML text, stdlib only): same series (insertion /
deletion / update / query), same axis labels, same title format, line
markers approximating the reference's o/s/^/x. The input is the long-
format metrics the benchmark grid already emits (model_name,
operation_type, operation_size, execution_time, cpu_usage,
memory_usage — ``pipeline.py:135-175``), as either a Spark DataFrame
or plain row dicts; the DataFrame path collects ONLY the aggregated
grid rows (ops × sizes — dozens, never data-scale).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

# reference series order and marker shapes (pipeline.py:188-191)
_SERIES = ["insertion", "deletion", "update", "query"]
_COLORS = {
    "insertion": "#1f77b4",
    "deletion": "#ff7f0e",
    "update": "#2ca02c",
    "query": "#d62728",
}
_PANELS = [
    # (title, y-axis label, metric column) — pipeline.py:192-217
    ("Execution Time", "Time (seconds)", "execution_time"),
    ("CPU Usage", "CPU Percentage", "cpu_usage"),
    ("Memory Usage", "Memory (MB)", "memory_usage"),
]
_X_LABEL = "Number of Embeddings / Queries"  # pipeline.py:193

_W, _H = 1500, 500  # the reference's 15x5-inch figure at 100 dpi
_PANEL_W, _MARGIN_L, _MARGIN_R, _MARGIN_T, _MARGIN_B = 500, 70, 20, 70, 60


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    step = (hi - lo) / (n - 1)
    return [lo + i * step for i in range(n)]


def _marker(op: str, x: float, y: float, color: str) -> str:
    """o / s / ^ / x, like the reference's per-series markers."""
    if op == "insertion":  # 'o'
        return f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" fill="{color}"/>'
    if op == "deletion":  # 's'
        return (
            f'<rect x="{x - 3.5:.1f}" y="{y - 3.5:.1f}" width="7" height="7" '
            f'fill="{color}"/>'
        )
    if op == "update":  # '^'
        return (
            f'<polygon points="{x:.1f},{y - 4.5:.1f} {x - 4:.1f},{y + 3.5:.1f} '
            f'{x + 4:.1f},{y + 3.5:.1f}" fill="{color}"/>'
        )
    return (  # 'x'
        f'<path d="M{x - 3.5:.1f},{y - 3.5:.1f} L{x + 3.5:.1f},{y + 3.5:.1f} '
        f'M{x - 3.5:.1f},{y + 3.5:.1f} L{x + 3.5:.1f},{y - 3.5:.1f}" '
        f'stroke="{color}" stroke-width="2"/>'
    )


def render_metrics_svg(rows, model_name: str) -> str:
    """Render the reference's 3-panel performance figure as an SVG
    string. ``rows``: iterable of mappings (or Spark Rows) carrying the
    long-format metrics schema."""
    data: dict[str, list[tuple[float, float, float, float]]] = {}
    for r in rows:
        get = r.get if hasattr(r, "get") else r.asDict().get
        op = get("operation_type")
        if op not in _SERIES:
            continue
        data.setdefault(op, []).append(
            (
                float(get("operation_size")),
                float(get("execution_time") or 0.0),
                float(get("cpu_usage") or 0.0),
                float(get("memory_usage") or 0.0),
            )
        )
    for op in data:
        data[op].sort()

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_W / 2}" y="30" text-anchor="middle" font-size="22">'
        f"Performance Metrics for {escape(str(model_name))}</text>",
    ]
    for p, (title, ylabel, _col) in enumerate(_PANELS):
        x0 = _MARGIN_L + p * _PANEL_W
        y0, plot_w = _MARGIN_T, _PANEL_W - _MARGIN_L - _MARGIN_R
        plot_h = _H - _MARGIN_T - _MARGIN_B
        xs = [pt[0] for pts in data.values() for pt in pts] or [0.0, 1.0]
        ys = [pt[1 + p] for pts in data.values() for pt in pts] or [0.0, 1.0]
        xlo, xhi = min(xs), max(xs)
        ylo, yhi = min(min(ys), 0.0), max(ys)
        if xhi <= xlo:
            xhi = xlo + 1.0
        if yhi <= ylo:
            yhi = ylo + 1.0

        def sx(v: float) -> float:
            return x0 + (v - xlo) / (xhi - xlo) * plot_w

        def sy(v: float) -> float:
            return y0 + plot_h - (v - ylo) / (yhi - ylo) * plot_h

        # frame, grid, ticks, labels (plt.grid(True) parity)
        parts.append(
            f'<rect x="{x0}" y="{y0}" width="{plot_w}" height="{plot_h}" '
            f'fill="none" stroke="black"/>'
        )
        for tv in _ticks(xlo, xhi):
            parts.append(
                f'<line x1="{sx(tv):.1f}" y1="{y0}" x2="{sx(tv):.1f}" '
                f'y2="{y0 + plot_h}" stroke="#dddddd"/>'
                f'<text x="{sx(tv):.1f}" y="{y0 + plot_h + 18}" '
                f'text-anchor="middle" font-size="11">{tv:g}</text>'
            )
        for tv in _ticks(ylo, yhi):
            parts.append(
                f'<line x1="{x0}" y1="{sy(tv):.1f}" x2="{x0 + plot_w}" '
                f'y2="{sy(tv):.1f}" stroke="#dddddd"/>'
                f'<text x="{x0 - 6}" y="{sy(tv) + 4:.1f}" text-anchor="end" '
                f'font-size="11">{tv:.3g}</text>'
            )
        parts.append(
            f'<text x="{x0 + plot_w / 2}" y="{y0 - 12}" text-anchor="middle" '
            f'font-size="15">{title}</text>'
            f'<text x="{x0 + plot_w / 2}" y="{_H - 18}" text-anchor="middle" '
            f'font-size="12">{_X_LABEL}</text>'
            f'<text x="{x0 - 48}" y="{y0 + plot_h / 2}" font-size="12" '
            f'transform="rotate(-90 {x0 - 48} {y0 + plot_h / 2})" '
            f'text-anchor="middle">{ylabel}</text>'
        )
        for op in _SERIES:
            pts = data.get(op)
            if not pts:
                continue
            color = _COLORS[op]
            poly = " ".join(f"{sx(pt[0]):.1f},{sy(pt[1 + p]):.1f}" for pt in pts)
            parts.append(
                f'<polyline points="{poly}" fill="none" stroke="{color}" '
                f'stroke-width="1.5"/>'
            )
            parts.extend(
                _marker(op, sx(pt[0]), sy(pt[1 + p]), color) for pt in pts
            )
        # legend (plt.legend() parity), top-left inside the panel
        for i, op in enumerate(s for s in _SERIES if s in data):
            ly = y0 + 16 + i * 16
            parts.append(
                f'<line x1="{x0 + 8}" y1="{ly}" x2="{x0 + 28}" y2="{ly}" '
                f'stroke="{_COLORS[op]}" stroke-width="1.5"/>'
                + _marker(op, x0 + 18, ly, _COLORS[op])
                + f'<text x="{x0 + 34}" y="{ly + 4}" font-size="12">'
                f"{op.capitalize()}</text>"
            )
    parts.append("</svg>")
    return "".join(parts)


def write_metrics_svg(metrics, path: str, model_name: str = "spark-engine") -> str:
    """S10 sink: write the 3-panel figure for one model to ``path``.
    ``metrics`` is a Spark DataFrame in the long format (collected
    here — grid-size rows only) or an iterable of mappings. Returns
    the path, like the reference's save-path print
    (pipeline.py:227-228)."""
    rows = metrics.collect() if hasattr(metrics, "collect") else list(metrics)
    svg = render_metrics_svg(rows, model_name)
    with open(path, "w") as f:
        f.write(svg)
    return path
