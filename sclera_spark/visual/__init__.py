"""Visual tier: `<query> PLOT ...` lowered to Vega-Lite.

Reference modules/visual (6,266 LoC) implements a grammar-of-graphics
layer rendered by the shell/web display (parser/PlotParser.scala:38-77,
model/plot/Geom.scala, exec/Renderer.scala). Here the same surface
lowers to a Vega-Lite v5 spec (the public declarative grammar any
notebook/browser can render) — the engine's job ends at the spec + a
bounded inline data sample, exactly where the reference hands off to its
renderer.
"""

from sclera_spark.visual.plot import (
    parse_plot,
    plot_result,
    split_plot_clause,
    to_vega_lite,
)

__all__ = ["parse_plot", "plot_result", "split_plot_clause", "to_vega_lite"]
