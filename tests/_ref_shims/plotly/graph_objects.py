"""plotly.graph_objects for the test shim: mutable trace objects and a
FigureWidget whose data/layout state the figure builders manipulate."""

from __future__ import annotations


class _Trace:
    """Base trace: constructor kwargs become mutable attributes (the
    builders set .x/.y/.hovertext after construction and read .name)."""

    _kind = "trace"

    def __init__(self, **kwargs):
        self._attrs = dict(kwargs)
        self._attrs.setdefault("name", "")
        self._click_handlers = []

    def __getattr__(self, key):
        try:
            return self.__dict__["_attrs"][key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key, value):
        if key in ("_attrs", "_click_handlers"):
            super().__setattr__(key, value)
        else:
            self._attrs[key] = value

    def on_click(self, fn, append=False):
        """shinywidgets-style click subscription; tests fire via
        trace._fire_click(points)."""
        if not append:
            self._click_handlers.clear()
        self._click_handlers.append(fn)

    def _fire_click(self, points):
        for fn in self._click_handlers:
            fn(self, points, None)

    def __repr__(self):
        return f"<{self._kind} {self._attrs.get('name', '')!r}>"


class Heatmap(_Trace):
    _kind = "heatmap"


class Scatter(_Trace):
    _kind = "scatter"


class Bar(_Trace):
    _kind = "bar"


class FigureWidget:
    def __init__(self, data=None, layout=None):
        self._data = list(data) if data else []
        self.layout = dict(layout) if layout else {}

    @property
    def data(self):
        return tuple(self._data)

    @data.setter
    def data(self, traces):
        self._data = list(traces)

    def add_trace(self, trace):
        self._data.append(trace)
        return self

    def add_traces(self, traces):
        self._data.extend(traces)
        return self

    def update_layout(self, **kwargs):
        self.layout.update(kwargs)
        return self


Figure = FigureWidget
