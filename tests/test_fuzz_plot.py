"""Fuzz family 11 (parse-level): PLOT-clause grammar round-trip.

The plot parser is hand-rolled (paren scanning, literal skipping,
top-level comma splitting) and r6 widened it (AXIS/MAP/TRANSITION/MARK/
POSITION) — exactly where a scanner bug hides. Each seed GENERATES a
random clause from the grammar together with its intended parse, then
asserts parse_plot reproduces that intent exactly. Pure driver-side:
no SparkSession."""

from __future__ import annotations

import random

import pytest

from sclera_spark.visual import parse_plot

N_SEEDS = 150

_GEOMS = ["point", "line", "bar", "area", "text", "tick"]
_AES = [("color", "color"), ("size", "size"), ("alpha", "opacity"), ("fill", "fill")]
_COLS = ["a", "b", "c_1", "val"]
_EXPRS = ["a + b", "a * 2", "abs(b)", "'lit''x'"]


def _gen(rng: random.Random):
    clause = []
    want_layers = []
    n_layers = rng.choice([1, 1, 1, 2, 3])
    for _ in range(n_layers):
        geom = rng.choice(_GEOMS)
        x = rng.choice(_COLS + _EXPRS[:2])
        aes = {"x": x}
        inner = [f"X = {x}"]
        if rng.random() < 0.9:
            y = rng.choice(_COLS)
            aes["y"] = y
            inner.append(f"Y = {y}")
        for name, chan in _AES:
            if rng.random() < 0.3:
                v = rng.choice(_COLS + _EXPRS)
                aes[chan] = v
                inner.append(f"{name.upper()} = {v}")
        body = [f"GEOM = {geom}({', '.join(inner)})"]
        marks = []
        if rng.random() < 0.4:
            axis = rng.choice([None, "XAXIS", "YAXIS"])
            pred = rng.choice(["a > 5", "b = 1 AND a < 3", "val IN (1, 2)"])
            mk = f"MARK {axis or ''} ({pred}, COLOR = 'red')"
            marks.append(
                {"axis": axis.lower() if axis else None, "predicate": pred,
                 "aes": {"color": "'red'"}}
            )
            body.append(mk)
        pos = None
        if geom == "bar" and rng.random() < 0.4:
            pos = rng.choice(["stack", "dodge", "fill"])
            body.append(f"POSITION = {pos}")
        rng.shuffle(body[1:])
        clause.append(f"PLOT ({', '.join(body)})")
        want_layers.append(
            {"geom": geom, "aes": aes, "marks": marks, "position": pos}
        )

    want_axes = []
    for _ in range(rng.choice([0, 0, 1, 2])):
        col = rng.choice(_COLS + ["x", "y"])
        tasks, parts = {}, []
        if rng.random() < 0.7:
            tasks["label"] = "L bl"
            parts.append("LABEL = 'L bl'")
        if rng.random() < 0.5:
            sc = rng.choice(["log", "sqrt", "time"])
            tasks["scale"] = sc
            parts.append(f"SCALE = {sc.upper()}")
        if rng.random() < 0.5:
            tasks["zoom"] = True
            parts.append("ZOOM" if rng.random() < 0.5 else "ZOOM = ON")
        if not parts:
            tasks["ticks"] = 4
            parts.append("TICKS = 4")
        clause.append(f"AXIS {col} ({', '.join(parts)})")
        want_axes.append((col, tasks))

    want = {"transition": {}, "map": {}, "facet": {}, "display": {}}
    if rng.random() < 0.3:
        want["transition"] = {"duration_ms": 300, "ease": "cubic"}
        clause.append("TRANSITION (DURATION = 300, EASE = 'cubic')")
    if rng.random() < 0.2:
        want["map"] = {"projection": "mercator"}
        clause.append("MAP (PROJECTION = 'mercator')")
    if rng.random() < 0.4:
        col = rng.choice(_COLS)
        want["facet"] = {"row": col}
        clause.append(f"FACET (ROWS = {col})")
    if rng.random() < 0.4:
        want["display"] = {"width": 320, "title": "T"}
        clause.append("DISPLAY (WIDTH = 320, TITLE = 'T')")
    return " ".join(clause), want_layers, want_axes, want


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_plot_parse_roundtrip(seed):
    rng = random.Random(9000 + seed)
    text, want_layers, want_axes, want = _gen(rng)
    spec = parse_plot(text)
    assert len(spec["layers"]) == len(want_layers), text
    for got, exp in zip(spec["layers"], want_layers):
        assert got["geom"] == exp["geom"], text
        assert got["aes"] == exp["aes"], text
        assert got["position"] == exp["position"], text
        assert len(got["marks"]) == len(exp["marks"]), text
        for gm, em in zip(got["marks"], exp["marks"]):
            assert gm["axis"] == em["axis"] and gm["predicate"] == em["predicate"], text
            assert gm["aes"] == em["aes"], text
    assert spec["axes"] == want_axes, text
    for k in ("transition", "map", "facet", "display"):
        assert spec[k] == want[k], (k, text)
