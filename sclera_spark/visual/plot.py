"""`<query> PLOT (...)` — grammar-of-graphics clause lowered to Vega-Lite.

Surface (a faithful subset of reference PlotParser.scala:38-77 /
layerSetTask:246-307 / axisSetTask:173-200 / mapSetTask:213-226 /
transitionSetTask:239-245; geoms from model/plot/Geom.scala):

    <query>
    PLOT ( GEOM = <geom>(X = expr, Y = expr [, <aes> = expr ...])
           [, <aes> = expr | POSITION = stack|dodge|fill
            | MARK [XAXIS|YAXIS] (pred [, aes...]) | GROUP = expr ]... )
    [ PLOT (...) | , LAYER (...) ]...
    [ FACET ( ROWS = col [, COLUMNS = col] ) ]
    [ AXIS <expr|X|Y> ( LABEL='...', SCALE=LOG|SQRT|LINEAR|TIME,
                        TICKS=n, TICKFORMAT='...', INCREASING[=ON|OFF],
                        ZOOM[=ON|OFF] ) ]...
    [ MAP ( PROJECTION = 'name'[(rot0, rot1)], ORIENT = (x, y, z) ) ]
    [ TRANSITION ( DURATION = ms, EASE = 'name' ) ]
    [ DISPLAY ( WIDTH = n, HEIGHT = n [, TITLE = 'text'] ) ]

geoms: point, line, bar, area, rect, text, boxplot, tick (+ map ->
geoshape; reference Point/Line/Bar/Rect/Text/BoxPlot/Ticker/GeoMap;
others degrade to their nearest Vega-Lite mark). aes: COLOR/COLOUR,
FILL, SIZE, SHAPE, ALPHA, STROKE (reference aesProp:332-336).

Interactivity lowering (r6, closing the reference's display-side
grammar): AXIS ZOOM binds a Vega-Lite interval param to the scales
(pan/zoom — native VL interactivity); MARK predicates are evaluated
SERVER-SIDE (a projected boolean column, fully distributed) and become
annotation layers filtered on that field — no SQL-to-Vega expression
transpilation, Spark stays the only expression engine; MAP PROJECTION
lowers to the VL `projection` block with `map` geoms as `geoshape`
marks. TRANSITION has no Vega-Lite equivalent (animation is render-side
in the reference too) and rides in `usermeta.transition`, the VL-legal
carrier for renderer hints.

Scale note: the query itself runs fully distributed; only the plotted
sample is collected, capped at `max_rows` (a plot is a human-scale
artifact — the reference's renderer materializes the full result into
the browser; the cap makes this honest at 100 TB).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

_PLOT_KW_RE = re.compile(
    r"\b(PLOT|FACET|DISPLAY|LAYER|TRANSITION|MAP)\s*\(", re.IGNORECASE
)
_AXIS_KW_RE = re.compile(r"\bAXIS\s+(.+?)\s*\(", re.IGNORECASE | re.DOTALL)

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
    "map": "geoshape",
}

_AXIS_SCALES = {"linear", "log", "sqrt", "time", "ordinal"}
_POSITIONS = {"stack", "dodge", "fill", "identity"}

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
    trailing layer-level tasks — aes assignments, POSITION, GROUP, and
    MARK annotation sub-clauses (reference layerSetTask:246-307)."""
    layer = {"geom": "point", "aes": {}, "marks": [], "position": None, "group": None}
    items = []
    for item in _split_top_commas(body):
        mm = re.match(
            r"^MARK\s*(XAXIS|YAXIS)?\s*\((.*)\)\s*$", item, re.I | re.S
        )
        if mm:
            axis = (mm.group(1) or "").lower()
            parts = _split_top_commas(mm.group(2))
            if not parts:
                raise ValueError("MARK needs a predicate")
            aes = {}
            for extra in parts[1:]:
                am = re.match(r"^(\w+)\s*=\s*(.+)$", extra, re.S)
                if am is None or am.group(1).lower() not in _AES_CHANNELS:
                    raise ValueError(f"bad MARK aesthetic: {extra!r}")
                aes[_AES_CHANNELS[am.group(1).lower()]] = am.group(2).strip()
            layer["marks"].append(
                {"axis": axis or None, "predicate": parts[0], "aes": aes}
            )
            continue
        items.append(item)
    for key, value in _parse_assignments(", ".join(items)) if items else []:
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
        elif key == "position":
            pos = value.strip().strip("'").lower()
            if pos not in _POSITIONS:
                raise ValueError(
                    f"unknown POSITION {pos!r} (supported: {sorted(_POSITIONS)})"
                )
            layer["position"] = pos
        elif key == "group":
            layer["group"] = value
        else:
            raise ValueError(f"unknown layer task {key!r}")
    if "x" not in layer["aes"] and layer["geom"] != "map":
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


def _parse_axis_tasks(body: str) -> dict:
    """AXIS task list (reference axisSetTask:173-200)."""
    out: dict = {}
    for item in _split_top_commas(body):
        bare = re.match(r"^(ZOOM|INCREASING|FREE)\s*$", item, re.I)
        if bare:
            out[bare.group(1).lower()] = True
            continue
        m = re.match(r"^(\w+)\s*=\s*(.+)$", item, re.S)
        if m is None:
            raise ValueError(f"bad AXIS task: {item!r}")
        k, v = m.group(1).lower(), m.group(2).strip()
        if k == "label":
            out["label"] = v.strip().strip("'")
        elif k == "scale":
            sc = v.strip().strip("'").lower()
            if sc not in _AXIS_SCALES:
                raise ValueError(f"unknown AXIS SCALE {sc!r}")
            out["scale"] = sc
        elif k in ("zoom", "increasing", "free"):
            out[k] = v.strip().upper() in ("ON", "TRUE", "1")
        elif k == "ticks":
            out["ticks"] = int(v)
        elif k == "tickformat":
            out["tickformat"] = v.strip().strip("'")
        else:
            raise ValueError(f"unknown AXIS task {k!r}")
    return out


def parse_plot(text: str) -> dict:
    """Parse the full trailing plot clause into {layers: [...], facet:
    {row?, column?}, display: {...}, axes: [(expr, tasks)...],
    transition: {...}, map: {...}}."""
    spec = {
        "layers": [], "facet": {}, "display": {},
        "axes": [], "transition": {}, "map": {},
    }
    i, n = 0, len(text)
    while i < n:
        am = _AXIS_KW_RE.match(text, i)
        # AXIS <expr> ( ... ): expr sits between keyword and paren, so it
        # needs its own scan (the expr itself may not contain a paren at
        # top level — parenthesized exprs wrap in the task list instead)
        if am is not None and "(" not in am.group(1):
            open_paren = am.end() - 1
            close = _find_balanced(text, open_paren)
            spec["axes"].append(
                (
                    am.group(1).strip(),
                    _parse_axis_tasks(text[open_paren + 1 : close - 1]),
                )
            )
            i = close
            continue
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
        elif kw == "TRANSITION":
            for k, v in _parse_assignments(body):
                if k == "duration":
                    spec["transition"]["duration_ms"] = int(v)
                elif k == "ease":
                    spec["transition"]["ease"] = v.strip().strip("'")
                else:
                    raise ValueError(f"unknown TRANSITION task {k!r}")
        elif kw == "MAP":
            for k, v in _parse_assignments(body):
                if k == "projection":
                    pm = re.match(
                        r"^'?(\w+)'?\s*(?:\(\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*\))?\s*$",
                        v,
                    )
                    if pm is None:
                        raise ValueError(f"bad MAP PROJECTION: {v!r}")
                    spec["map"]["projection"] = pm.group(1).lower()
                    if pm.group(2) is not None:
                        spec["map"]["rotate2"] = [
                            float(pm.group(2)), float(pm.group(3))
                        ]
                elif k in ("orient", "orientation"):
                    om = re.match(
                        r"^\(\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*\)\s*$",
                        v,
                    )
                    if om is None:
                        raise ValueError(f"bad MAP ORIENT: {v!r}")
                    spec["map"]["rotate"] = [float(om.group(i)) for i in (1, 2, 3)]
                else:
                    raise ValueError(f"unknown MAP task {k!r}")
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


def _norm_expr(e: str) -> str:
    return re.sub(r"\s+", "", e).lower()


def to_vega_lite(spec: dict, df, max_rows: int = 5000) -> dict:
    """Lower a parsed plot spec + its query result into a Vega-Lite v5
    dict. Channel expressions AND mark predicates are projected
    server-side (distributed) so the spec references plain fields; only
    the capped sample collects."""
    proj, enc_fields = [], []  # (layer_idx, channel) -> field name
    multi = len(spec["layers"]) > 1
    mark_fields = []  # (layer_idx, mark_idx, field)
    for li, layer in enumerate(spec["layers"]):
        for channel, expr in layer["aes"].items():
            field = f"l{li}_{channel}" if multi else channel
            proj.append(F.expr(expr).alias(field))
            enc_fields.append((li, channel, field))
        if layer.get("group"):
            field = f"l{li}_group" if multi else "group"
            proj.append(F.expr(layer["group"]).alias(field))
            enc_fields.append((li, "detail", field))
        for mi, mark in enumerate(layer.get("marks", ())):
            field = f"l{li}_mark{mi}"
            # the annotation predicate is evaluated by SPARK — the spec
            # only filters on the resulting boolean field
            proj.append(
                F.coalesce(F.expr(mark["predicate"]), F.lit(False)).alias(field)
            )
            mark_fields.append((li, mi, field))
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

    # AXIS config, bound to whichever channel's expression matches
    axis_cfg: dict[str, dict] = {}
    zoom = False
    for expr, tasks in spec["axes"]:
        ne = _norm_expr(expr)
        chan = None
        if ne in ("x", "y"):
            chan = ne
        else:
            for li, channel, _f in enc_fields:
                if channel in ("x", "y") and _norm_expr(
                    spec["layers"][li]["aes"][channel]
                ) == ne:
                    chan = channel
                    break
        if chan is None:
            raise ValueError(f"AXIS expression {expr!r} matches no X/Y channel")
        axis_cfg[chan] = tasks
        if tasks.get("zoom"):
            zoom = True

    def encoding(li: int) -> dict:
        enc = {}
        for lj, channel, field in enc_fields:
            if lj != li:
                continue
            e: dict = {"field": field, "type": _vl_type(dtypes[field])}
            tasks = axis_cfg.get(channel, {})
            if "label" in tasks:
                e.setdefault("axis", {})["title"] = tasks["label"]
            if "tickformat" in tasks:
                e.setdefault("axis", {})["format"] = tasks["tickformat"]
            if "ticks" in tasks:
                e.setdefault("axis", {})["tickCount"] = tasks["ticks"]
            if "scale" in tasks and tasks["scale"] != "linear":
                sc = {"time": "time", "log": "log", "sqrt": "sqrt",
                      "ordinal": "ordinal"}[tasks["scale"]]
                if sc == "time":
                    e["type"] = "temporal"
                else:
                    e.setdefault("scale", {})["type"] = sc
            if tasks.get("increasing") is False:
                e.setdefault("sort", "descending")
            layer = spec["layers"][li]
            if layer.get("position") and channel == "y":
                e["stack"] = {
                    "stack": "zero", "fill": "normalize",
                    "identity": None, "dodge": None,
                }[layer["position"]]
            enc[channel] = e
        layer = spec["layers"][li]
        if layer.get("position") == "dodge" and "color" in enc:
            # side-by-side bars: VL's xOffset channel on the color field
            enc["xOffset"] = dict(enc["color"])
        return enc

    def layer_block(li: int) -> dict:
        layer = spec["layers"][li]
        block = {"mark": _GEOM_MARKS[layer["geom"]], "encoding": encoding(li)}
        if zoom and layer["geom"] != "map":
            block["params"] = [
                {"name": f"zoom{li}", "select": "interval", "bind": "scales"}
            ]
        return block

    blocks = [layer_block(li) for li in range(len(spec["layers"]))]
    # MARK annotations: one extra rule/point layer per mark, filtered on
    # the server-evaluated predicate field
    for li, mi, field in mark_fields:
        mark = spec["layers"][li]["marks"][mi]
        src = blocks[li]["encoding"]
        # MARK XAXIS -> vertical rules at matching x; MARK YAXIS ->
        # horizontal rules at matching y; bare MARK defaults to x
        chan = "y" if mark["axis"] == "yaxis" else "x"
        enc: dict = {}
        if chan in src:
            enc[chan] = {k: v for k, v in src[chan].items() if k != "stack"}
        for channel, expr in mark["aes"].items():
            enc[channel] = {"value": expr.strip().strip("'")}
        blocks.append(
            {
                "mark": "rule",
                "transform": [{"filter": f"datum.{field}"}],
                "encoding": enc,
            }
        )

    vl: dict = {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "data": {"values": rows},
    }
    if len(blocks) == 1:
        vl.update(blocks[0])
    else:
        vl["layer"] = blocks
    for fc in spec["facet"]:
        target = vl["encoding"] if "encoding" in vl else vl["layer"][0]["encoding"]
        target[fc] = {
            "field": f"facet_{fc}",
            "type": _vl_type(dtypes[f"facet_{fc}"]),
        }
    if spec["map"]:
        prj: dict = {"type": spec["map"].get("projection", "mercator")}
        if "rotate" in spec["map"]:
            prj["rotate"] = spec["map"]["rotate"]
        elif "rotate2" in spec["map"]:
            prj["rotate"] = spec["map"]["rotate2"] + [0.0]
        vl["projection"] = prj
    if spec["transition"]:
        # Vega-Lite has no animation grammar; the reference renders
        # transitions client-side too — carry the renderer contract in
        # the VL-legal usermeta block
        vl["usermeta"] = {"transition": spec["transition"]}
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
