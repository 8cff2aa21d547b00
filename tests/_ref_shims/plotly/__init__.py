"""Test-only functional ``plotly`` shim (the shiny-shim precedent).

plotly is not installable in this environment, so the whereIsMyClass
figure builders (compute.plot_micrograph / mark_classes_on_helices /
draw_distance_measurement / plot_histogram) and the app's figure
reactive handlers only ever exercised their plotly-free fallbacks.
This shim implements exactly the surface those builders use — trace
objects with mutable attributes, FigureWidget with a settable ``data``
tuple, add_trace(s), update_layout, per-trace on_click — as working
state, not stubs, so the figure mutation logic runs and can be
asserted against in-suite.

Placed on PYTHONPATH only by the web-app tests. NOT part of the
library.
"""

from . import colors, graph_objects  # noqa: F401

__version__ = "0.0-helicon-test-shim"
