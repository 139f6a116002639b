from __future__ import annotations

from deployment_spark.benchmark import run_model_grid, run_reference_grid


def test_reference_grid_schema_and_rows(spark, tmp_path):
    metrics = run_reference_grid(
        spark,
        str(tmp_path / "bench_store"),
        sizes=[50, 100],  # reduced grid for tests; real grid in BENCH runs
        initial_rows=200,
        dim=16,
    )
    rows = metrics.collect()
    # reference long-format schema, FAISS/PlainDemo/README.md:96-99
    assert metrics.columns == [
        "model_name",
        "operation_type",
        "operation_size",
        "execution_time",
        "cpu_usage",
        "memory_usage",
    ]
    assert len(rows) == 2 * 4  # sizes × {insertion, deletion, update, query}
    ops = {r.operation_type for r in rows}
    assert ops == {"insertion", "deletion", "update", "query"}
    assert all(r.execution_time > 0 for r in rows)


def test_model_grid_runs_per_model(spark, tmp_path):
    """The reference's outer 7-model loop (pipeline.py:290-307), proven
    end-to-end on a 2-model hash-embedder axis: every model runs the full
    CRUD grid at its own vector dimension into its own store, and the
    combined metrics table carries the model dimension in the reference's
    long format (pipeline.py:397-401)."""
    metrics = run_model_grid(
        spark,
        str(tmp_path / "model_grid"),
        models=[("hash-embedder-16d", 16), ("hash-embedder-32d", 32)],
        sizes=[50, 100],
        initial_rows=200,
    )
    rows = metrics.collect()
    assert metrics.columns[0] == "model_name"
    by_model = {}
    for r in rows:
        by_model.setdefault(r.model_name, set()).add(r.operation_type)
    assert set(by_model) == {"hash-embedder-16d", "hash-embedder-32d"}
    # each model ran the whole op grid PLUS its per-model index rebuild
    # (pipeline.py:310-321 — IVF build + pruned search per model)
    assert all(
        ops == {"insertion", "deletion", "update", "query", "ivf_build", "ivf_query"}
        for ops in by_model.values()
    )
    assert len(rows) == 2 * (2 * 4 + 2)  # models x (sizes x ops + ivf rows)
    # per-model stores really are separate (sanitized dirs)
    assert (tmp_path / "model_grid" / "hash_embedder_16d").exists()
    assert (tmp_path / "model_grid" / "hash_embedder_32d").exists()
    assert (tmp_path / "model_grid" / "hash_embedder_16d_ivf").exists()
    assert (tmp_path / "model_grid" / "hash_embedder_32d_ivf").exists()


def test_bench_headline_maps_onto_registry():
    """Every bench row names a driver-registry entry (VERDICT r4 #4):
    the bench set and the 50-entry catalog must not drift again."""
    import bench
    from deployment_spark.queries import REGISTRY

    assert set(bench.HEADLINE) <= set(REGISTRY)
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_plot_sink_renders_reference_figure(tmp_path):
    """S10 — the plot sink (sources/plot.py) renders the reference's
    3-panel figure (FAISS/PlainDemo/pipeline.py:183-230) as valid SVG:
    three framed panels titled Execution Time / CPU Usage / Memory
    Usage, one polyline + markers per operation type, legend, suptitle
    with the model name. Parsed with stdlib ElementTree — a malformed
    document fails here."""
    import xml.etree.ElementTree as ET

    from deployment_spark.sources.plot import render_metrics_svg, write_metrics_svg

    rows = [
        {
            "model_name": "m",
            "operation_type": op,
            "operation_size": size,
            "execution_time": 0.1 * size / 2500 + i,
            "cpu_usage": 10.0 * (i + 1),
            "memory_usage": 5.0 * size / 2500,
        }
        for i, op in enumerate(["insertion", "deletion", "update", "query"])
        for size in (2500, 5000, 7500)
    ]
    path = write_metrics_svg(rows, str(tmp_path / "metrics.svg"), "unit-model")
    svg = open(path).read()
    root = ET.fromstring(svg)  # well-formed XML or this raises
    ns = "{http://www.w3.org/2000/svg}"
    texts = [t.text for t in root.iter(f"{ns}text")]
    assert "Performance Metrics for unit-model" in texts
    for title in ("Execution Time", "CPU Usage", "Memory Usage"):
        assert title in texts
    polylines = root.findall(f"{ns}polyline")
    assert len(polylines) == 12  # 4 series x 3 panels
    # every polyline has one x,y pair per grid size, inside the canvas
    for pl in polylines:
        pts = [tuple(map(float, p.split(","))) for p in pl.get("points").split()]
        assert len(pts) == 3
        assert all(0 <= x <= 1500 and 0 <= y <= 500 for x, y in pts)
        assert [x for x, _ in pts] == sorted(x for x, _ in pts)  # x ascending
    # execution_time panel: series i has strictly higher time => lower y
    # at the same x for the first panel's polylines (series order pinned)
    first_panel = [
        [tuple(map(float, p.split(","))) for p in pl.get("points").split()]
        for pl in polylines
        if all(float(p.split(",")[0]) < 570 for p in pl.get("points").split())
    ]
    assert len(first_panel) == 4
    # markers present (circle/rect/polygon/path per series)
    assert root.findall(f"{ns}circle") and root.findall(f"{ns}polygon")
    # model name is XML-escaped, not injected
    evil = render_metrics_svg(rows, 'x"><script>alert(1)</script>')
    ET.fromstring(evil)
    assert "<script>" not in evil


def test_plot_sink_accepts_spark_metrics(spark, tmp_path):
    """The sink's DataFrame path: collect the grid-size metrics rows
    and render — the composition bench.py --grid runs."""
    from deployment_spark.sources.plot import write_metrics_svg

    df = spark.createDataFrame(
        [
            ("m", "insertion", 2500, 0.5, 12.0, 3.0),
            ("m", "insertion", 5000, 0.9, 14.0, 4.0),
            ("m", "query", 2500, 0.2, 8.0, 1.0),
            ("m", "query", 5000, 0.4, 9.0, 1.5),
        ],
        "model_name string, operation_type string, operation_size long, "
        "execution_time double, cpu_usage double, memory_usage double",
    )
    path = write_metrics_svg(df, str(tmp_path / "m.svg"), "spark-df")
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    assert len(root.findall("{http://www.w3.org/2000/svg}polyline")) == 6  # 2x3


def test_prometheus_exposition_format(spark, tmp_path):
    """B5 — engine-side Prometheus exporter (sources/metrics.py): the
    text exposition rendering (HELP/TYPE headers, label escaping,
    deterministic order) and the store health gauges."""
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.sources.metrics import (
        STORE_TYPES,
        prometheus_text,
        store_samples,
    )

    s = SnapshotStore(spark, str(tmp_path / "s"), key="id", mode="mor")
    s.create(spark.createDataFrame([(1, "a")], ["id", "p"]))
    s.insert(spark.createDataFrame([(2, "b")], ["id", "p"]))
    text = prometheus_text(store_samples(s, include_count=True), types=STORE_TYPES)
    lines = text.strip().splitlines()
    assert "# TYPE deployment_store_compaction_failures_total counter" in lines
    assert any(
        l.startswith("deployment_store_version{") and l.endswith(" 2.0") for l in lines
    )
    assert any(
        l.startswith("deployment_store_rows{") and l.endswith(" 2.0") for l in lines
    )
    # full float precision in sample values (repr, not %g): a counter
    # past 1e6 must keep its small increments so rate() still works
    big = prometheus_text([("uptime_seconds_total", {}, 1234567.25)])
    assert "uptime_seconds_total 1234567.25" in big
    # label escaping: quotes/backslashes/newlines can't corrupt the format
    esc = prometheus_text([("m_x", {"k": 'a"b\\c\nd'}, 1.0)])
    assert 'k="a\\"b\\\\c\\nd"' in esc
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prometheus_text([("bad name", {}, 1.0)])
    with _pytest.raises(ValueError):
        prometheus_text([("ok", {"bad label": "x"}, 1.0)])


def test_metrics_endpoint_scrapes_benchmark_rows():
    """The /metrics endpoint end-to-end with stdlib urllib as the
    scraper — the shape the reference's prometheus.yml scrape config
    (observability_deployment/prometheus.yml:15-17) points at."""
    import urllib.request

    from deployment_spark.sources.metrics import (
        BENCH_HELP,
        CONTENT_TYPE,
        MetricsServer,
        benchmark_samples,
    )

    rows = [
        {
            "model_name": "hash-64",
            "operation_type": "insertion",
            "operation_size": 2500,
            "execution_time": 0.42,
            "cpu_usage": 11.0,
            "memory_usage": 3.5,
        }
    ]
    srv = MetricsServer(
        lambda: benchmark_samples(rows), help_text=BENCH_HELP
    ).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=10
        ) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == CONTENT_TYPE
            body = resp.read().decode()
        assert (
            'deployment_benchmark_execution_seconds{model="hash-64",'
            'operation="insertion",size="2500"} 0.42' in body
        )
        assert "# HELP deployment_benchmark_execution_seconds" in body
        # non-/metrics paths 404
        import urllib.error

        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/other", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
