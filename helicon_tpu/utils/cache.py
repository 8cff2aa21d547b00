"""Content-addressed on-disk result cache with expiry.

This is the framework's checkpoint/resume analog: expensive pure functions
(EMDB downloads, symmetrized maps, precomputed geometry) are memoised to
disk with a validity window, alongside JAX's own persistent compilation
cache which is enabled here for the whole process.

Parity: /root/reference/src/helicon/lib/cache.py (setup_cache_dir:17-43,
cache decorator:132-209, DummyMemory:84-131).
"""

from __future__ import annotations

import datetime
import functools
import logging
import os
import tempfile
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["setup_cache_dir", "cache", "clear_cache", "enable_jax_compilation_cache"]


def setup_cache_dir() -> Path:
    """Resolve the cache directory.

    Priority: ``$HELICON_CACHE_DIR`` -> /fast-scratch/<user>/helicon ->
    ~/.cache/helicon -> a temp dir. The first writable candidate wins.
    """
    candidates = []
    if "HELICON_CACHE_DIR" in os.environ:
        candidates.append(Path(os.environ["HELICON_CACHE_DIR"]))
    user = os.environ.get("USER", "user")
    candidates.append(Path("/fast-scratch") / user / "helicon")
    candidates.append(Path.home() / ".cache" / "helicon")
    for cand in candidates:
        try:
            cand.mkdir(parents=True, exist_ok=True)
            probe = cand / ".write_probe"
            probe.touch()
            probe.unlink()
            return cand
        except OSError:
            continue
    return Path(tempfile.mkdtemp(prefix="helicon_cache_"))


def enable_jax_compilation_cache(cache_dir: Path | None = None) -> None:
    """Point JAX's persistent compilation cache inside our cache dir."""
    try:
        import jax

        d = (cache_dir or setup_cache_dir()) / "jax_compilation_cache"
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


class _ExpiringMemory:
    """joblib.Memory wrapper that invalidates entries older than N days."""

    def __init__(self, cache_dir, expires_after: float | None, verbose: int = 0):
        import joblib

        self.memory = joblib.Memory(location=str(cache_dir), verbose=verbose)
        self.expires_after = expires_after

    def cache(self, func, ignore=None):
        memorized = self.memory.cache(func, ignore=ignore or [])
        expires_after = self.expires_after

        if expires_after is None or expires_after <= 0:
            return memorized

        cutoff = datetime.timedelta(days=expires_after)

        def validate(metadata) -> bool:
            try:
                age = datetime.timedelta(seconds=metadata["duration"])  # noqa: F841
                import time

                mtime = metadata.get("time", None)
                if mtime is None:
                    return True
                return (time.time() - mtime) < cutoff.total_seconds()
            except Exception:
                return True

        memorized.cache_validation_callback = validate
        return memorized


class DummyMemory:
    """No-op stand-in when the cache dir is unwritable."""

    def cache(self, func, ignore=None):
        return func


def cache(cache_dir=None, ignore=None, expires_after: float | None = None, verbose=0):
    """Decorator: disk-memoise a pure function with optional expiry (days).

    ``ignore`` lists argument names excluded from the cache key (e.g.
    ``verbose``, ``cpu``).
    """

    def decorator(func):
        try:
            d = Path(cache_dir) if cache_dir is not None else setup_cache_dir()
            d.mkdir(parents=True, exist_ok=True)
            mem = _ExpiringMemory(d, expires_after, verbose=verbose)
        except (OSError, ImportError):
            # unwritable cache dir OR joblib absent (it is an optional
            # dependency): degrade to pass-through, never crash imports
            mem = DummyMemory()
        cached_func = mem.cache(func, ignore=ignore)
        if cached_func is not func:  # update_wrapper(func, func) would
            # set a self-referential __wrapped__ that breaks inspect
            functools.update_wrapper(cached_func, func)
        return cached_func

    return decorator


def clear_cache(cache_dir=None) -> None:
    """Delete everything under the cache directory."""
    import shutil

    d = Path(cache_dir) if cache_dir is not None else setup_cache_dir()
    if d.exists():
        shutil.rmtree(d, ignore_errors=True)
        d.mkdir(parents=True, exist_ok=True)
