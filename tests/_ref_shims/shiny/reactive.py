"""shiny.reactive for the test shim: working value/effect/event/calc/
extended_task primitives on the Session runtime in __init__."""

from __future__ import annotations

import asyncio
import threading

from . import Effect, SilentException, _UNSET, get_session


class value:
    """reactive.value: get() registers a dependency, set() invalidates."""

    def __init__(self, initial=_UNSET):
        self._v = initial
        get_session().values[id(self)] = self

    def get(self):
        s = get_session()
        s.register_read(id(self))
        if self._v is _UNSET:
            raise SilentException("unset reactive value")
        return self._v

    def set(self, v):
        self._v = v
        get_session().invalidate(id(self))

    def __call__(self):  # shiny allows value() as a getter too
        return self.get()


def _dep_key(obj):
    """Map an @reactive.event argument to its invalidation key."""
    from .express import _InputAccessor

    if isinstance(obj, _InputAccessor):
        return ("input", obj._name)
    if isinstance(obj, value):
        return id(obj)
    return id(obj)


def event(*deps, ignore_none=True, ignore_init=False):
    def deco(fn):
        fn._event_deps = [_dep_key(d) for d in deps]
        return fn

    return deco


def effect(fn):
    s = get_session()
    ev = getattr(fn, "_event_deps", None)
    eff = Effect(fn, event_deps=ev or (), event_only=ev is not None)
    s.effects.append(eff)
    # shiny runs every effect once at session start (event-filtered
    # effects run too unless ignore_init; the apps rely on the initial
    # pass to ingest the default URL input); req()/SilentException gates
    # the ones whose inputs aren't ready
    s._queue.append(eff)
    s._drain()
    return fn


def calc(fn):
    """Recompute on every call; reads inside register deps in the caller
    (sufficient for the apps: calcs are read from renderers)."""
    return fn


class isolate:
    def __enter__(self):
        get_session()._isolated += 1
        return self

    def __exit__(self, *exc):
        get_session()._isolated -= 1
        return False


class extended_task:
    """@reactive.extended_task: async fn -> task object.

    Session.sync_tasks True (default): invoking the task runs the
    coroutine to completion on a worker thread and JOINS — tests drive
    the whole flow synchronously. False: returns immediately; the abort
    test polls and joins via .join().
    """

    def __init__(self, fn):
        self._fn = fn
        self._result = _UNSET
        self._error: Exception | None = None
        self._thread: threading.Thread | None = None
        self.__name__ = getattr(fn, "__name__", "extended_task")

    def __call__(self, *args, **kwargs):
        def run():
            try:
                self._result = asyncio.run(self._fn(*args, **kwargs))
            except Exception as e:  # surfaced via .result()
                self._error = e
            finally:
                get_session().invalidate(id(self))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        if get_session().sync_tasks:
            self._thread.join()

    def join(self, timeout=None):
        if self._thread is not None:
            self._thread.join(timeout)

    def result(self):
        get_session().register_read(id(self))
        if self._error is not None:
            raise self._error
        if self._result is _UNSET:
            raise SilentException("extended task has no result yet")
        return self._result


_reactive_lock = threading.RLock()


class _AsyncLock:
    async def __aenter__(self):
        _reactive_lock.acquire()
        return self

    async def __aexit__(self, *exc):
        _reactive_lock.release()
        return False


def lock():
    return _AsyncLock()


async def flush():
    get_session()._drain()
