"""Native (C++) runtime components, compiled on demand.

The TPU compute path is JAX/XLA; the host-side runtime around it — here
the STAR table codec that feeds every images2star/metadata pipeline —
is C++ (star_codec.cpp), loaded through ctypes. No pybind11: the ABI is
plain C arrays + numpy buffers.

Build model: the .cpp ships with the package; the first use compiles it
with g++ into a per-source-hash shared object under
~/.cache/helicon_tpu/ (or $HELICON_NATIVE_CACHE). Every entry point
degrades to the pure-Python implementation when the toolchain or a
compiled object is unavailable, and HELICON_NO_NATIVE=1 disables native
paths outright (used by the fallback tests).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

_LOCK = threading.Lock()
_CODEC: object = None  # None = untried, False = unavailable, CDLL = loaded
_REFINE: object = None  # same tri-state for the GN refine engine


def _compile(src: pathlib.Path) -> pathlib.Path | None:
    """Compile src into the cache dir; None on ANY failure (read-only
    home, no g++, timeout, ...) so callers fall back to pure Python."""
    tmp = None
    try:
        d = os.environ.get("HELICON_NATIVE_CACHE", "")
        cache = (
            pathlib.Path(d)
            if d
            else pathlib.Path.home() / ".cache" / "helicon_tpu"
        )
        cache.mkdir(parents=True, exist_ok=True)
        code = src.read_bytes()
        compile_flags = ["-O3", "-march=native", "-funroll-loops",
                         "-std=c++17", "-shared", "-fPIC"]
        # key on source AND host ISA AND the actual compile flags:
        # -march=native binaries must never be shared across CPUs (a
        # shared NFS $HOME in a multi-host launch would SIGILL on the
        # weaker machine), and editing the flag list must invalidate
        # older caches
        try:
            cpu = pathlib.Path("/proc/cpuinfo").read_bytes()
            flags = next(
                (ln for ln in cpu.split(b"\n") if ln.startswith(b"flags")),
                b"",
            )
        except OSError:
            flags = os.uname().machine.encode()
        tag = hashlib.sha256(
            code + b"|" + " ".join(compile_flags).encode() + b"|" + flags
        ).hexdigest()[:16]
        so = cache / f"{src.stem}-{tag}.so"
        if so.exists():
            return so
        tmp = so.with_suffix(f".{os.getpid()}.tmp")
        cmd = ["g++", *compile_flags, "-o", str(tmp), str(src)]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
        return so
    except Exception:
        if tmp is not None:
            try:
                tmp.unlink(missing_ok=True)
            except OSError:
                pass
        return None


def load_star_codec():
    """ctypes handle to the STAR codec, or None (pure-Python fallback)."""
    global _CODEC
    # flag semantics: "0" / "false" / "" mean ENABLED (a user exporting
    # HELICON_NO_NATIVE=0 to opt in must not silently lose the codec)
    if os.environ.get("HELICON_NO_NATIVE", "").lower() not in ("", "0", "false"):
        return None
    with _LOCK:
        if _CODEC is None:
            _CODEC = False
            src = pathlib.Path(__file__).parent / "star_codec.cpp"
            so = _compile(src) if src.exists() else None
            if so is not None:
                try:
                    lib = ctypes.CDLL(str(so))
                    c_char_p = ctypes.c_char_p
                    i8p = ctypes.POINTER(ctypes.c_int8)
                    i32p = ctypes.POINTER(ctypes.c_int32)
                    i64p = ctypes.POINTER(ctypes.c_int64)
                    f64p = ctypes.POINTER(ctypes.c_double)
                    lib.star_scan.restype = ctypes.c_int64
                    lib.star_scan.argtypes = [
                        c_char_p, ctypes.c_int64, ctypes.c_int32, i8p,
                    ]
                    lib.star_parse.restype = ctypes.c_int64
                    lib.star_parse.argtypes = [
                        c_char_p, ctypes.c_int64, ctypes.c_int32, i8p,
                        ctypes.c_int64, f64p, i64p, i32p,
                    ]
                    lib.star_format.restype = ctypes.c_int64
                    lib.star_format.argtypes = [
                        ctypes.c_int64, ctypes.c_int32, i8p, f64p, i64p,
                        c_char_p, i64p, i32p, ctypes.c_char_p, ctypes.c_int64,
                    ]
                    lib.star_gather_strings.restype = ctypes.c_int64
                    lib.star_gather_strings.argtypes = [
                        c_char_p, i64p, i32p, ctypes.c_int64,
                        ctypes.c_char_p, i32p,
                    ]
                    _CODEC = lib
                except OSError:
                    _CODEC = False
        return _CODEC or None


def load_refine_engine():
    """ctypes handle to the GN pose-refinement engine
    (refine_engine.cpp), or None — callers fall back to the JAX loop.
    Same build/caching/fallback model as the STAR codec."""
    global _REFINE
    if os.environ.get("HELICON_NO_NATIVE", "").lower() not in ("", "0", "false"):
        return None
    with _LOCK:
        if _REFINE is None:
            _REFINE = False
            src = pathlib.Path(__file__).parent / "refine_engine.cpp"
            so = _compile(src) if src.exists() else None
            if so is not None:
                try:
                    lib = ctypes.CDLL(str(so))
                    f32p = ctypes.POINTER(ctypes.c_float)
                    i32p = ctypes.POINTER(ctypes.c_int32)
                    u8p = ctypes.POINTER(ctypes.c_uint8)
                    lib.helicon_refine_candidate.restype = ctypes.c_int
                    lib.helicon_refine_candidate.argtypes = [
                        f32p, f32p, f32p,                     # region/mask/cellok
                        ctypes.c_int, ctypes.c_int,            # d2, l2
                        ctypes.c_int, ctypes.c_int,            # d3, l3
                        ctypes.c_float, ctypes.c_int,          # scale, csym
                        ctypes.c_float, ctypes.c_float,        # twist, rise_px
                        i32p, i32p, u8p, ctypes.c_int,         # copies
                        i32p, u8p, ctypes.c_int,               # pairs
                        ctypes.c_int,                          # interp_linear
                        ctypes.c_int, ctypes.c_int,            # cg, fista
                        ctypes.c_int, ctypes.c_int,            # power, positive
                        ctypes.c_float, ctypes.c_float,        # tilt0, psi0
                        ctypes.c_float,                        # dy0
                        f32p, f32p, ctypes.c_int,              # lo, hi, max_iter
                        f32p, f32p,                            # out pose, score
                    ]
                    _REFINE = lib
                except OSError:
                    _REFINE = False
        return _REFINE or None
