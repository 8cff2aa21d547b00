"""Test-only ``shinywidgets`` shim: render_widget behaves like the shiny
shim's render decorators (register the output renderer AND run it as an
effect so the figure builds at boot / on dependency changes)."""

from shiny.express import render

render_widget = render.widget
output_widget = None  # UI placeholder; the Express apps don't call it
