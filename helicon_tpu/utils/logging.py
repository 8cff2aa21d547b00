"""Logging, timing, and command-audit helpers.

Parity: /root/reference/src/helicon/lib/logging.py (color_print:16-40,
getLogger:41-95, log_command_line:96-119, timedelta2string:133-168,
Timer:169-213). TPU addition: ``Timer`` optionally opens a
``jax.profiler.TraceAnnotation`` so stages show up in TPU profiles.
"""

from __future__ import annotations

import datetime
import logging
import os
import sys
import time

__all__ = [
    "color_print",
    "getLogger",
    "log_command_line",
    "timedelta2string",
    "Timer",
]

_COLORS = {
    "black": 30,
    "red": 31,
    "green": 32,
    "yellow": 33,
    "blue": 34,
    "magenta": 35,
    "cyan": 36,
    "white": 37,
}


def color_print(*args, color: str = "red", **kwargs) -> None:
    """Print with ANSI color when stdout is a terminal."""
    code = _COLORS.get(color, 31)
    if sys.stdout.isatty():
        print(f"\033[{code}m", end="")
        print(*args, **kwargs)
        print("\033[0m", end="", flush=True)
    else:
        print(*args, **kwargs)


def getLogger(
    logfile: str | None = None, verbose: int = 1, name: str = "helicon"
) -> logging.Logger:
    """Logger with an optional file handler and a console handler.

    verbose<=0 -> WARNING, 1 -> INFO, >=2 -> DEBUG on the console.
    """
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    for h in logger.handlers:  # close old file handlers: clear() alone
        h.close()  # leaks one fd per getLogger(logfile=...) call
    logger.handlers.clear()

    console = logging.StreamHandler()
    console.setLevel(
        logging.WARNING if verbose <= 0 else logging.INFO if verbose == 1 else logging.DEBUG
    )
    console.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(console)

    if logfile:
        fh = logging.FileHandler(logfile)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(fh)
    return logger


def log_command_line(logfile: str = "helicon.log") -> None:
    """Append the current command line (with timestamp and cwd) to *logfile*."""
    try:
        with open(logfile, "a") as fp:
            stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            fp.write(f"{stamp}\t{os.getcwd()}\t{' '.join(sys.argv)}\n")
    except OSError:
        pass


def timedelta2string(td, verbose: int = 2) -> str:
    """Render a duration as e.g. ``1h 2m 3.4s`` keeping *verbose* fields.

    Accepts a datetime.timedelta OR plain seconds (the reference's
    logging.py:133 signature takes float/int seconds)."""
    total = td.total_seconds() if hasattr(td, "total_seconds") else float(td)
    sign = "-" if total < 0 else ""
    total = abs(total)
    days, rem = divmod(total, 86400)
    hours, rem = divmod(rem, 3600)
    minutes, seconds = divmod(rem, 60)
    fields = []
    if days:
        fields.append(f"{int(days)}d")
    if hours or fields:
        fields.append(f"{int(hours)}h")
    if minutes or fields:
        fields.append(f"{int(minutes)}m")
    fields.append(f"{seconds:.1f}s")
    kept = fields[: max(1, verbose)] if len(fields) > verbose else fields
    return sign + " ".join(kept)


class Timer:
    """Context manager that logs wall-clock time for a stage.

    When ``trace=True`` the stage is also wrapped in a
    ``jax.profiler.TraceAnnotation`` so it appears in TPU profile
    timelines (the TPU analog of the reference's verbose timers).
    """

    def __init__(
        self,
        name: str = "",
        verbose: bool | int = True,
        logger: logging.Logger | None = None,
        trace: bool = False,
        info: str | None = None,
    ):
        # `info` is the reference's label kwarg (lib/logging.py:185);
        # accept both spellings so reference call sites run unchanged
        self.name = info if info is not None else name
        self.info = self.name
        self.verbose = verbose
        self.logger = logger or logging.getLogger("helicon")
        self.trace = trace
        self._annotation = None
        self.elapsed = 0.0
        # reference-compatible attributes (lib/logging.py Timer sets
        # start/end/interval; tests assert t.interval > 0)
        self.start = 0.0
        self.end = 0.0
        self.interval = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.start = self.t0
        if self.trace:
            try:
                import jax.profiler

                self._annotation = jax.profiler.TraceAnnotation(self.name or "Timer")
                self._annotation.__enter__()
            except Exception:
                self._annotation = None
        return self

    def __exit__(self, *exc):
        if self._annotation is not None:
            self._annotation.__exit__(*exc)
        self.elapsed = time.perf_counter() - self.t0
        self.end = self.t0 + self.elapsed
        self.interval = self.elapsed
        if self.verbose:
            td = datetime.timedelta(seconds=self.elapsed)
            self.logger.info("%s: %s", self.name, timedelta2string(td))
        return False
