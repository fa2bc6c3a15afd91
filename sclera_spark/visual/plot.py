"""`<query> PLOT (...)` — grammar-of-graphics clause lowered to Vega-Lite.

Surface (a faithful subset of reference PlotParser.scala:38-77 /
layerSetTask:246-307; geoms from model/plot/Geom.scala):

    <query>
    PLOT ( GEOM = <geom>(X = expr, Y = expr [, <aes> = expr ...])
           [, <aes> = expr ]... )
    [ PLOT (...) | , LAYER (...) ]...
    [ FACET ( ROWS = col [, COLUMNS = col] ) ]
    [ DISPLAY ( WIDTH = n, HEIGHT = n [, TITLE = 'text'] ) ]

geoms: point, line, bar, area, rect, text, boxplot, tick (reference
Point/Line/Bar/Rect/Text/BoxPlot/Ticker; others degrade to their nearest
Vega-Lite mark). aes: COLOR/COLOUR, FILL, SIZE, SHAPE, ALPHA, STROKE
(reference aesProp:332-336).

Scale note: the query itself runs fully distributed; only the plotted
sample is collected, capped at `max_rows` (a plot is a human-scale
artifact — the reference's renderer materializes the full result into
the browser; the cap makes this honest at 100 TB).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

_PLOT_KW_RE = re.compile(r"\b(PLOT|FACET|DISPLAY|LAYER)\s*\(", re.IGNORECASE)

_GEOM_MARKS = {
    "point": "point",
    "line": "line",
    "bar": "bar",
    "area": "area",
    "rect": "rect",
    "text": "text",
    "boxplot": "boxplot",
    "tick": "tick",
    "ribbon": "area",
    "segment": "rule",
}

_AES_CHANNELS = {
    "x": "x",
    "y": "y",
    "color": "color",
    "colour": "color",
    "fill": "fill",
    "size": "size",
    "shape": "shape",
    "alpha": "opacity",
    "stroke": "color",
    "tooltip": "tooltip",
}


def _scan_top_level_kw(sql: str) -> int | None:
    """Offset of the first top-level PLOT keyword (outside parens and
    literals), or None."""
    depth, i, n = 0, 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n:
                if sql[i] == "'" and i + 1 < n and sql[i + 1] == "'":
                    i += 2
                elif sql[i] == "'":
                    break
                else:
                    i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and sql[i : i + 4].upper() == "PLOT" and (
            i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
        ):
            rest = sql[i + 4 :].lstrip()
            if rest.startswith("("):
                return i
        i += 1
    return None


def split_plot_clause(sql: str) -> tuple[str, str | None]:
    """Split `<query> PLOT (...) [FACET (...)] [DISPLAY (...)]` into
    (query, plot_text). plot_text is None when no top-level PLOT clause
    exists."""
    pos = _scan_top_level_kw(sql)
    if pos is None:
        return sql, None
    return sql[:pos].strip(), sql[pos:].strip()


def _split_top_commas(text: str) -> list[str]:
    out, depth, cur, i, n = [], 0, [], 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            cur.append(c)
            i += 1
            while i < n:
                cur.append(sql_c := text[i])
                if sql_c == "'" and i + 1 < n and text[i + 1] == "'":
                    cur.append(text[i + 1])
                    i += 2
                    continue
                if sql_c == "'":
                    break
                i += 1
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _find_balanced(text: str, start: int) -> int:
    depth, i, n = 0, start, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            i += 1
            while i < n and text[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in PLOT clause")


def _parse_assignments(body: str) -> list[tuple[str, str]]:
    """`KEY = value, KEY = value` with expression-valued right sides."""
    out = []
    for item in _split_top_commas(body):
        m = re.match(r"^(\w+)\s*=\s*(.+)$", item, re.S)
        if m is None:
            raise ValueError(f"bad PLOT assignment: {item!r}")
        out.append((m.group(1).lower(), m.group(2).strip()))
    return out


def _parse_layer(body: str) -> dict:
    """One PLOT/LAYER body: GEOM = geom(X = ..., Y = ..., aes...) plus
    trailing layer-level aes assignments."""
    layer = {"geom": "point", "aes": {}}
    for key, value in _parse_assignments(body):
        if key == "geom":
            gm = re.match(r"^(\w+)\s*(\(.*\))?\s*$", value, re.S)
            if gm is None:
                raise ValueError(f"bad GEOM spec: {value!r}")
            geom = gm.group(1).lower()
            if geom not in _GEOM_MARKS:
                raise ValueError(
                    f"unknown geom {geom!r} (supported: {sorted(_GEOM_MARKS)})"
                )
            layer["geom"] = geom
            if gm.group(2):
                for k, v in _parse_assignments(gm.group(2)[1:-1]):
                    if k not in _AES_CHANNELS:
                        raise ValueError(f"unknown aesthetic {k!r}")
                    layer["aes"][_AES_CHANNELS[k]] = v
        elif key in _AES_CHANNELS:
            layer["aes"][_AES_CHANNELS[key]] = value
        else:
            raise ValueError(f"unknown layer task {key!r}")
    if "x" not in layer["aes"]:
        raise ValueError("layer needs an X aesthetic")
    return layer


def _parse_plot_body(body: str) -> list[dict]:
    """A PLOT body is either direct layer tasks, nested `LAYER (...)`
    groups (reference dataSubPlotSetLayer:98-101), or leading tasks
    followed by LAYER groups."""
    layers, current = [], []
    for item in _split_top_commas(body):
        lm = re.match(r"^LAYER\s*\((.*)\)\s*$", item, re.I | re.S)
        if lm:
            if current:
                layers.append(_parse_layer(", ".join(current)))
                current = []
            layers.append(_parse_layer(lm.group(1)))
        else:
            current.append(item)
    if current:
        layers.append(_parse_layer(", ".join(current)))
    return layers


def parse_plot(text: str) -> dict:
    """Parse the full trailing plot clause into
    {layers: [...], facet: {row?, column?}, display: {...}}."""
    spec = {"layers": [], "facet": {}, "display": {}}
    i, n = 0, len(text)
    while i < n:
        m = _PLOT_KW_RE.match(text, i)
        if m is None:
            if text[i].isspace() or text[i] == ",":
                i += 1
                continue
            raise ValueError(f"unparsable PLOT clause at: {text[i : i + 30]!r}")
        kw = m.group(1).upper()
        open_paren = m.end() - 1
        close = _find_balanced(text, open_paren)
        body = text[open_paren + 1 : close - 1]
        if kw in ("PLOT", "LAYER"):
            spec["layers"].extend(_parse_plot_body(body))
        elif kw == "FACET":
            for k, v in _parse_assignments(body):
                if k not in ("rows", "columns"):
                    raise ValueError(f"unknown FACET task {k!r}")
                spec["facet"]["row" if k == "rows" else "column"] = v
        else:  # DISPLAY
            for k, v in _parse_assignments(body):
                if k in ("width", "height"):
                    spec["display"][k] = int(v)
                elif k == "title":
                    spec["display"][k] = v.strip().strip("'")
                else:
                    raise ValueError(f"unknown DISPLAY task {k!r}")
        i = close
    if not spec["layers"]:
        raise ValueError("PLOT clause has no layers")
    return spec


def _vl_type(dtype: str) -> str:
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        return "temporal"
    if dtype in ("boolean", "string"):
        return "nominal"
    return "quantitative"


def to_vega_lite(spec: dict, df, max_rows: int = 5000) -> dict:
    """Lower a parsed plot spec + its query result into a Vega-Lite v5
    dict. Channel expressions are projected server-side (distributed) so
    the spec references plain fields; only the capped sample collects."""
    proj, enc_fields = [], []  # (layer_idx, channel) -> field name
    for li, layer in enumerate(spec["layers"]):
        for channel, expr in layer["aes"].items():
            field = f"l{li}_{channel}" if len(spec["layers"]) > 1 else channel
            proj.append(F.expr(expr).alias(field))
            enc_fields.append((li, channel, field))
    for fc, expr in spec["facet"].items():
        proj.append(F.expr(expr).alias(f"facet_{fc}"))

    sample = df.select(*proj).limit(max_rows)
    dtypes = dict(sample.dtypes)
    rows = []
    for r in sample.collect():
        d = r.asDict()
        for k, v in d.items():
            if hasattr(v, "isoformat"):
                d[k] = v.isoformat()
        rows.append(d)

    def encoding(li: int) -> dict:
        enc = {}
        for lj, channel, field in enc_fields:
            if lj == li:
                enc[channel] = {"field": field, "type": _vl_type(dtypes[field])}
        return enc

    vl: dict = {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "data": {"values": rows},
    }
    if len(spec["layers"]) == 1:
        vl["mark"] = _GEOM_MARKS[spec["layers"][0]["geom"]]
        vl["encoding"] = encoding(0)
    else:
        vl["layer"] = [
            {"mark": _GEOM_MARKS[layer["geom"]], "encoding": encoding(li)}
            for li, layer in enumerate(spec["layers"])
        ]
    for fc in spec["facet"]:
        target = vl["encoding"] if "encoding" in vl else vl["layer"][0]["encoding"]
        target[fc] = {
            "field": f"facet_{fc}",
            "type": _vl_type(dtypes[f"facet_{fc}"]),
        }
    for k, v in spec["display"].items():
        vl[k] = v
    return vl


def plot_result(engine, query: str, plot_text: str, max_rows: int = 5000):
    """Run the data query through the engine, lower the plot clause, and
    return a single-row DataFrame carrying the Vega-Lite spec JSON — the
    shape a serving client (or the pg-wire server) can deliver."""
    df = engine.sql(query)
    spec = parse_plot(plot_text)
    vl = to_vega_lite(spec, df, max_rows=max_rows)
    return engine.spark.createDataFrame(
        [(json.dumps(vl, sort_keys=True),)], "vega_lite_spec string"
    )
