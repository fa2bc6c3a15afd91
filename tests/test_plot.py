"""Visual tier: `<query> PLOT ...` -> Vega-Lite lowering.

Reference modules/visual (PlotParser.scala:38-77 grammar; Geom.scala
geoms; ReplParser wires `<query> PLOT ...` into the shell). The lowering
target here is Vega-Lite v5 — spec structure is asserted against the
public schema's shape (mark/encoding/layer/facet channels).
"""

from __future__ import annotations

import json

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.visual import parse_plot, split_plot_clause


@pytest.fixture(scope="module")
def engine(spark, tables):
    eng = ScleraEngine(spark)
    for name, df in tables.items():
        eng.add_table(name, df)
    return eng


def test_split_plot_clause():
    q, p = split_plot_clause("SELECT a FROM t PLOT (GEOM = point(X = a, Y = b))")
    assert q == "SELECT a FROM t"
    assert p.startswith("PLOT")
    # no clause
    q, p = split_plot_clause("SELECT a FROM t")
    assert p is None
    # PLOT inside a literal is not a clause
    q, p = split_plot_clause("SELECT 'PLOT (x)' AS s FROM t")
    assert p is None
    # PLOT inside parens (subquery) is not top-level
    q, p = split_plot_clause("SELECT * FROM (SELECT 'PLOT (' AS s) AS d")
    assert p is None


def test_parse_plot_grammar():
    spec = parse_plot(
        "PLOT (GEOM = line(X = ts, Y = total), COLOR = event_type) "
        "FACET (ROWS = region) DISPLAY (WIDTH = 400, HEIGHT = 300, TITLE = 'T')"
    )
    assert spec["layers"][0]["geom"] == "line"
    assert spec["layers"][0]["aes"]["x"] == "ts"
    assert spec["layers"][0]["aes"]["color"] == "event_type"
    assert spec["facet"] == {"row": "region"}
    assert spec["display"] == {"width": 400, "height": 300, "title": "T"}
    with pytest.raises(ValueError, match="unknown geom"):
        parse_plot("PLOT (GEOM = sunburst(X = a))")
    with pytest.raises(ValueError, match="needs an X"):
        parse_plot("PLOT (GEOM = point(Y = a))")


def test_plot_simple_query(engine):
    out = engine.sql(
        "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey "
        "PLOT (GEOM = bar(X = n_regionkey, Y = n))"
    )
    rows = out.collect()
    assert out.columns == ["vega_lite_spec"] and len(rows) == 1
    vl = json.loads(rows[0][0])
    assert vl["mark"] == "bar"
    assert vl["encoding"]["x"]["type"] == "quantitative"
    assert vl["encoding"]["y"] == {"field": "y", "type": "quantitative"}
    assert len(vl["data"]["values"]) == 5
    assert {v["x"] for v in vl["data"]["values"]} == {0, 1, 2, 3, 4}


def test_plot_expressions_layers_facet(engine):
    out = engine.sql(
        "SELECT r_regionkey, r_name FROM region "
        "PLOT (GEOM = point(X = r_regionkey * 2, Y = length(r_name), "
        "SIZE = r_regionkey), LAYER (GEOM = line(X = r_regionkey, Y = r_regionkey))) "
        "FACET (COLUMNS = r_name) DISPLAY (TITLE = 'regions')"
    )
    vl = json.loads(out.collect()[0][0])
    assert len(vl["layer"]) == 2
    assert vl["layer"][0]["mark"] == "point"
    assert vl["layer"][0]["encoding"]["size"]["field"] == "l0_size"
    assert vl["layer"][1]["mark"] == "line"
    assert vl["layer"][0]["encoding"]["column"]["type"] == "nominal"
    assert vl["title"] == "regions"
    # expressions were computed server-side
    xs = sorted(v["l0_x"] for v in vl["data"]["values"])
    assert xs == [0, 2, 4, 6, 8]


def test_plot_temporal_axis(engine):
    out = engine.sql(
        "SELECT ts, value FROM events PLOT (GEOM = line(X = ts, Y = value))"
    )
    vl = json.loads(out.collect()[0][0])
    assert vl["encoding"]["x"]["type"] == "temporal"
    # timestamps serialized to ISO strings for JSON transport
    assert "T" in vl["data"]["values"][0]["x"]


def test_plot_sample_cap(engine):
    from sclera_spark.visual import plot_result

    out = plot_result(
        engine, "SELECT l_orderkey, l_quantity FROM lineitem",
        "PLOT (GEOM = point(X = l_orderkey, Y = l_quantity))", max_rows=100,
    )
    vl = json.loads(out.collect()[0][0])
    assert len(vl["data"]["values"]) == 100


def test_plot_false_positive_falls_back(engine):
    # a column alias / function named plot must not hijack the query
    df = engine.sql("SELECT upper(r_name) AS plot FROM region")
    assert df.columns == ["plot"]
    assert df.count() == 5


def test_parse_interactive_grammar():
    """r6 surface: AXIS tasks, ZOOM, TRANSITION, MAP, MARK, POSITION
    (reference axisSetTask:173-200, transitionSetTask:239-245,
    mapSetTask:213-226, layerSetMark:296-299)."""
    spec = parse_plot(
        "PLOT (GEOM = bar(X = g, Y = total), POSITION = stack, "
        "      MARK XAXIS (total > 100, COLOR = 'red')) "
        "AXIS g (LABEL = 'Group', ZOOM) "
        "AXIS total (SCALE = LOG, TICKS = 5) "
        "TRANSITION (DURATION = 500, EASE = 'cubic') "
        "DISPLAY (WIDTH = 300)"
    )
    layer = spec["layers"][0]
    assert layer["position"] == "stack"
    assert layer["marks"][0]["predicate"] == "total > 100"
    assert layer["marks"][0]["aes"] == {"color": "'red'"}
    assert dict(spec["axes"])["g"] == {"label": "Group", "zoom": True}
    assert dict(spec["axes"])["total"] == {"scale": "log", "ticks": 5}
    assert spec["transition"] == {"duration_ms": 500, "ease": "cubic"}


def test_plot_zoom_axis_mark_lowering(engine):
    """End-to-end: ZOOM binds an interval param to scales (real VL
    interactivity); AXIS LABEL/SCALE land on the encoding; the MARK
    predicate is evaluated SERVER-SIDE and becomes a filtered rule
    layer."""
    df = engine.sql("""
        SELECT n_name AS g, n_nationkey AS v FROM nation
        PLOT (GEOM = point(X = g, Y = v),
              MARK XAXIS (v > 20, COLOR = 'red'))
        AXIS v (LABEL = 'key', SCALE = SQRT, ZOOM)
    """)
    vl = json.loads(df.first()["vega_lite_spec"])
    assert "layer" in vl  # base + annotation layer
    base, rule = vl["layer"]
    assert base["params"][0]["bind"] == "scales"  # pan/zoom
    assert base["encoding"]["y"]["axis"]["title"] == "key"
    assert base["encoding"]["y"]["scale"]["type"] == "sqrt"
    assert rule["mark"] == "rule"
    assert rule["transform"] == [{"filter": "datum.l0_mark0"}]
    assert rule["encoding"]["color"] == {"value": "red"}
    # predicate was evaluated by Spark: boolean field in the data rows
    assert all(isinstance(r["l0_mark0"], bool) for r in vl["data"]["values"])
    assert sum(r["l0_mark0"] for r in vl["data"]["values"]) == 4  # keys 21-24


def test_plot_map_projection(engine):
    df = engine.sql("""
        SELECT n_name FROM nation
        PLOT (GEOM = map(COLOR = n_name))
        MAP (PROJECTION = 'albers'(10, 20))
    """)
    vl = json.loads(df.first()["vega_lite_spec"])
    assert vl["mark"] == "geoshape"
    assert vl["projection"] == {"type": "albers", "rotate": [10.0, 20.0, 0.0]}


def test_plot_transition_usermeta(engine):
    df = engine.sql("""
        SELECT n_nationkey AS x, n_regionkey AS y FROM nation
        PLOT (GEOM = point(X = x, Y = y))
        TRANSITION (DURATION = 250, EASE = 'linear')
    """)
    vl = json.loads(df.first()["vega_lite_spec"])
    assert vl["usermeta"] == {
        "transition": {"duration_ms": 250, "ease": "linear"}
    }


def test_plot_position_dodge(engine):
    df = engine.sql("""
        SELECT n_regionkey AS g, count(*) AS n, max(n_name) AS nm
        FROM nation GROUP BY n_regionkey
        PLOT (GEOM = bar(X = g, Y = n, COLOR = nm), POSITION = dodge)
    """)
    vl = json.loads(df.first()["vega_lite_spec"])
    assert vl["encoding"]["y"]["stack"] is None
    assert vl["encoding"]["xOffset"]["field"] == "color"
