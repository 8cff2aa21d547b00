"""denovo3D Shiny Express app (requires the optional `shiny` extra).

Reference: webApps/denovo3D/app.py (2598 LoC). This native app covers the
core workflow — upload/URL input, image preparation, (twist, rise) grid
setup, one-shot sharded grid search via helicon_tpu.denovo3d, and a
score-ranked result display. Transform-chain editing and the ITK montage
preview of the reference are not reproduced.
"""

from __future__ import annotations

import numpy as np

try:
    from shiny import reactive, render, ui
    from shiny.express import input, output  # noqa: F401
except ImportError as e:  # pragma: no cover - gated on the shiny extra
    raise ImportError(
        "the denovo3D web app requires the optional 'shiny' extra; "
        "use `helicon denovo3d_cli` for the batch interface"
    ) from e

from helicon_tpu.denovo3d import build_candidate_grid, reconstruct_grid
from helicon_tpu.io.mrc import read_mrc
from helicon_tpu.utils.system import encode_numpy

ui.page_opts(title="denovo3D (helicon-tpu)", fillable=True)

results = reactive.value(None)

with ui.sidebar():
    ui.input_file("image_file", "2D class average (.mrc/.mrcs)")
    ui.input_numeric("image_index", "Image index (1-based)", 1, min=1)
    ui.input_numeric("apix", "Pixel size (A)", 0.0)
    ui.input_slider("twist_range", "Twist range (deg)", 0.1, 180.0, (0.5, 45.0))
    ui.input_numeric("twist_step", "Twist step (deg)", 1.0)
    ui.input_slider("rise_range", "Rise range (A)", 1.0, 200.0, (4.0, 5.0))
    ui.input_numeric("rise_step", "Rise step (A)", 0.25)
    ui.input_numeric("csym", "Csym", 1, min=1)
    ui.input_action_button("run", "Run denovo3D")


@reactive.effect
@reactive.event(input.run)
def _run():
    f = input.image_file()
    if not f:
        return
    path = f[0]["datapath"]
    img = np.squeeze(read_mrc(path)[0])
    if img.ndim == 3:
        img = img[int(input.image_index()) - 1]
    apix = float(input.apix()) or float(read_mrc(path)[1])
    t0, t1 = input.twist_range()
    r0, r1 = input.rise_range()
    twists, rises = build_candidate_grid(
        t0, t1, float(input.twist_step()), r0, r1, float(input.rise_step())
    )
    res = reconstruct_grid(
        img, apix=apix, twists=twists, rises=rises, csym=int(input.csym()),
        horizontalize=1, transpose=-1, return_best_volume=True,
    )
    results.set(res)


@render.ui
def result_table():
    res = results.get()
    if res is None:
        return ui.p("Upload a class average and press Run.")
    rows = [
        ui.tags.tr(
            ui.tags.td(f"{t:.3f}"), ui.tags.td(f"{r:.3f}"), ui.tags.td(f"{s:.5f}")
        )
        for t, r, s in res.top(20)
    ]
    return ui.tags.table(
        ui.tags.tr(
            ui.tags.th("twist (deg)"), ui.tags.th("rise (A)"), ui.tags.th("score")
        ),
        *rows,
    )


@render.ui
def best_projection():
    res = results.get()
    if res is None or res.best_volume is None:
        return None
    proj = np.asarray(res.best_volume).sum(axis=2).T
    return ui.tags.img(src=encode_numpy(proj), width="512px")
