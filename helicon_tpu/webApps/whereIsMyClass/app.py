"""whereIsMyClass Shiny Express app (requires the `shiny` extra).

Reference: webApps/whereIsMyClass/app.py (655 LoC). Core workflow: load
Class2D params (star/cs), pick classes, show per-class micrograph
locations and the same-class pair-distance histogram. The interactive
distance-measurement overlay of the reference is not reproduced.
"""

from __future__ import annotations

import numpy as np

try:
    from shiny import reactive, render, ui
    from shiny.express import input  # noqa: F401
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "the whereIsMyClass web app requires the optional 'shiny' extra"
    ) from e

from helicon_tpu.io.metadata import images2dataframe
from . import compute

ui.page_opts(title="whereIsMyClass (helicon-tpu)", fillable=True)

params = reactive.value(None)

with ui.sidebar():
    ui.input_file("param_file", "Class2D metadata (.star/.cs)")
    ui.input_text("class_indices", "Class indices (comma, 1-based)", "1")
    ui.input_numeric("target_count", "Target pair count", 10000)


@reactive.effect
def _load():
    f = input.param_file()
    if not f:
        return
    params.set(
        images2dataframe(f[0]["datapath"], target_convention="relion")
    )


@render.text
def summary():
    p = params.get()
    if p is None:
        return "Load a Class2D star/cs file."
    n_classes = p["rlnClassNumber"].nunique() if "rlnClassNumber" in p else 0
    return f"{len(p)} particles, {n_classes} classes"


@render.ui
def histogram():
    p = params.get()
    if p is None or "rlnClassNumber" not in p:
        return None
    indices = [int(i) - 1 for i in str(input.class_indices()).split(",") if i]
    helices = compute.select_classes(p, indices)
    lengths = compute.get_filament_length(helices)
    dists, _ = compute.compute_pair_distances(
        helices, lengths, target_total_count=int(input.target_count())
    )
    if len(dists) == 0:
        return ui.p("no pair distances for the selected classes")
    import matplotlib

    matplotlib.use("Agg")
    import io as _io

    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    ax.hist(dists, bins=100)
    ax.set_xlabel("pair distance (A)")
    ax.set_ylabel("count")
    buf = _io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    import base64

    src = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    return ui.tags.img(src=src, width="100%")
