"""shiny.express for the test shim: the module-level input/output/render
objects the Express apps import. `ui` is the same working module as
shiny.ui (Express adds page_opts etc., which ui.py already carries)."""

from __future__ import annotations

from . import SilentException, get_session
from . import ui as ui  # noqa: F401  (re-export)


class _InputAccessor:
    """input.<name> — calling it reads the value and registers a dep."""

    __slots__ = ("_name",)

    def __init__(self, name):
        self._name = name

    def __call__(self):
        s = get_session()
        s.register_read(("input", self._name))
        if self._name not in s.inputs:
            raise SilentException(f"input {self._name!r} not set")
        return s.inputs[self._name]


class _Input:
    def __getattr__(self, name):
        if name == "_map":
            return dict(get_session().inputs)
        return _InputAccessor(name)

    def __contains__(self, name):
        return name in get_session().inputs


input = _Input()


class _Output:
    def __call__(self, fn):  # @output decorator form
        return fn


output = _Output()


class DataGrid:
    """render.DataGrid / render.DataTable — a value wrapper, not a
    decorator: holds the DataFrame a @render.data_frame renderer returns."""

    def __init__(self, data, **options):
        self.data = data
        self.options = options

    def text(self):
        return self.data.to_string()


DataTable = DataGrid


class _RenderDecorator:
    """@render.ui / @render.plot / ... — registers the output renderer
    AND runs it as an effect, so dynamic UI (inputs created inside a
    renderer, like denovo3D's input_source_ui) registers its inputs at
    boot and re-registers them when the renderer's deps change — the
    shim's stand-in for the client round trip."""

    def __getattr__(self, kind):
        if kind in ("DataGrid", "DataTable"):
            return DataGrid

        def deco(fn=None, **kwargs):
            if fn is None:  # parametrized form @render.ui(...)
                return lambda f: deco(f)
            s = get_session()
            s.outputs[fn.__name__] = fn
            from . import Effect

            ev = getattr(fn, "_event_deps", None)
            eff = Effect(fn, event_deps=ev or (), event_only=ev is not None)
            s.effects.append(eff)
            s._queue.append(eff)
            s._drain()
            return fn

        return deco


render = _RenderDecorator()
