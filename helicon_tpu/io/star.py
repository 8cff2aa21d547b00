"""Native STAR file parser/writer (no starfile dependency).

Replaces the reference's use of the `starfile` package (lib/io.py:549+,
star2dataframe/dataframe2star). Supports the RELION subset: multiple
data_ blocks, loop_ tables, simple key-value blocks, comments, and
numeric type inference.
"""

from __future__ import annotations

import io as _io
import re
import shlex
from pathlib import Path

import numpy as np
import pandas as pd

__all__ = ["read_star", "write_star"]


def _coerce(series: pd.Series) -> pd.Series:
    """Numeric conversion where the whole column parses."""
    s = pd.to_numeric(series, errors="coerce")
    if s.notna().all():
        try:
            as_int = s.astype(np.int64)
            if (as_int == s).all():
                return as_int
        except (ValueError, TypeError, OverflowError):
            pass  # non-finite or out-of-int64-range floats stay float
        return s
    return series


def _tokenize(line: str):
    if '"' in line or "'" in line:
        return shlex.split(line, comments=False)
    return line.split()


def _parse_loop_native(rows_or_body, cols, block=""):
    """Fast loop-table parse via the C++ codec (native/star_codec.cpp).

    rows_or_body: pre-cleaned row lines (list) or a raw body slice (str;
    the codec skips blank lines and full-line comments itself).
    Returns a DataFrame with identical typing to the Python path
    (pd.to_numeric where the whole column parses, int64 where integral),
    None when the codec is unavailable or the table needs the quoted
    tokenizer, and raises the same loud ValueError on a row whose token
    count differs from the header's column count.
    """
    from ..native import load_star_codec

    lib = load_star_codec()
    if lib is None:
        return None
    text = (
        rows_or_body
        if isinstance(rows_or_body, str)
        else "\n".join(rows_or_body)
    )
    if '"' in text or "'" in text:
        return None  # quoted tokens -> shlex path
    body = text.encode("utf-8")
    ncols = len(cols)
    kind = np.zeros(ncols, np.int8)
    import ctypes

    i8p = kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    nrows = lib.star_scan(body, len(body), ncols, i8p)
    if nrows < 0:
        bad = -(nrows + 1)
        clean = [
            s
            for s in (l.strip() for l in text.splitlines())
            if s and not s.startswith("#")
        ]
        vals = clean[bad].split()
        raise ValueError(
            f"STAR loop row has {len(vals)} tokens but the header "
            f"declares {ncols} columns (block 'data_{block}', "
            f"row {bad + 1}): {clean[bad]!r}"
        )
    if nrows == 0:
        return _empty_loop_frame(cols)
    n_num = int(kind.sum())
    n_str = ncols - n_num
    num = np.empty((max(n_num, 1), max(nrows, 1)), np.float64)
    s_start = np.empty((max(n_str, 1), max(nrows, 1)), np.int64)
    s_len = np.empty((max(n_str, 1), max(nrows, 1)), np.int32)
    lib.star_parse(
        body, len(body), ncols, i8p, nrows,
        num.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        s_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    data = {}
    num_slot = str_slot = 0
    for c_i, c in enumerate(cols):
        if kind[c_i]:
            col = num[num_slot, :nrows]
            num_slot += 1
            finite = np.isfinite(col)
            if finite.all() and (col == np.floor(col)).all():
                # float64 is exact only below 2^53: larger integers must
                # go through the Python parser (pd.to_numeric is exact
                # int64) or the two paths would disagree by rounding
                if np.abs(col).max() >= 2**53:
                    return None
                data[c] = col.astype(np.int64)
            else:
                data[c] = col.copy()
        else:
            st, ln = s_start[str_slot, :nrows], s_len[str_slot, :nrows]
            str_slot += 1
            data[c] = _strings_from_offsets(lib, body, st, ln, nrows)
    return pd.DataFrame(data, columns=list(cols))


def _empty_loop_frame(cols):
    """Zero-row loop table with the line machine's dtypes (vacuous
    to_numeric succeeds on empty columns -> int64)."""
    df = pd.DataFrame([], columns=list(cols))
    for c in df.columns:
        df[c] = _coerce(df[c])
    return df


def _strings_from_offsets(lib, body: bytes, starts, lens, nrows: int):
    """String column from token offsets: Arrow-layout gather in C++ +
    zero-copy pyarrow StringArray when available, else a decode loop."""
    try:
        import ctypes

        import pyarrow as pa

        total = int(lens.sum())
        if total > np.iinfo(np.int32).max:
            # the Arrow gather uses int32 offsets; >2 GiB of string
            # bytes would overflow them silently — decode loop instead
            raise ImportError("string column exceeds int32 Arrow offsets")
        out = np.empty(max(total, 1), np.uint8)
        offs = np.empty(nrows + 1, np.int32)
        starts = np.ascontiguousarray(starts)
        lens = np.ascontiguousarray(lens)
        lib.star_gather_strings(
            body,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nrows,
            out.ctypes.data_as(ctypes.c_char_p),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        # pa.py_buffer holds a reference to the ndarray: zero-copy
        return pa.StringArray.from_buffers(
            nrows, pa.py_buffer(offs), pa.py_buffer(memoryview(out)[:total])
        )
    except ImportError:
        return [
            body[s : s + l].decode("utf-8") for s, l in zip(starts, lens)
        ]


def read_star(path_or_buffer):
    """Parse a STAR file into {block_name: DataFrame | dict}.

    loop_ tables become DataFrames; bare key-value blocks become dicts.
    Block names keep their ``data_`` suffix stripped ("" for ``data_``).
    """
    if hasattr(path_or_buffer, "read"):
        text = path_or_buffer.read()
    else:
        text = Path(path_or_buffer).read_text()
    if '"' not in text and "'" not in text:
        from ..native import load_star_codec

        if load_star_codec() is not None:
            blocks = _read_star_blocks(text)
            if blocks is not None:
                return blocks
    return _read_star_python(text)


# startswith() semantics of the line machine: anything after the prefix
# belongs to the name / is ignored
_BLOCK_RE = re.compile(r"^[ \t]*data_(.*?)[ \t\r]*$", re.M)
_LOOP_RE = re.compile(r"^[ \t]*loop_[^\n]*$", re.M)


def _read_star_blocks(text: str):
    """Regex block splitter feeding raw body slices to the C++ codec —
    no per-line Python loop over the (large) row region. Returns None
    for shapes the splitter does not model (the Python machine handles
    them): key-value lines after loop rows, loops without the native
    codec, etc."""
    blocks: dict = {}
    marks = list(_BLOCK_RE.finditer(text))
    if not marks:
        return {}
    for i, m in enumerate(marks):
        name = m.group(1)
        seg_end = marks[i + 1].start() if i + 1 < len(marks) else len(text)
        seg = text[m.end(): seg_end]
        lm = _LOOP_RE.search(seg)
        if lm is None:
            pairs = _parse_pairs(seg)
            if pairs:
                blocks[name] = pairs
            continue
        rest = seg[lm.end():]
        if rest.startswith("\n"):
            rest = rest[1:]
        if _LOOP_RE.search(rest):
            return None  # multiple loop_ lines in one block: python machine
        # header scan: walk lines manually so only the (few) header
        # lines are touched, never the row region
        cols: list = []
        off = 0
        body_start = None
        n_rest = len(rest)
        while off < n_rest:
            nl = rest.find("\n", off)
            end = n_rest if nl == -1 else nl + 1
            s = rest[off:end].strip()
            if not s or s.startswith("#"):
                off = end
                continue
            if s.startswith("_"):
                cols.append(s.split()[0][1:])
                off = end
                continue
            body_start = off
            break
        if not cols:
            return None  # loop_ with no columns: let the machine decide
        if body_start is None:
            df = _empty_loop_frame(cols)
        else:
            body = rest[body_start:]
            if "\n_" in body:
                return None  # key-value lines after rows: python machine
            df = _parse_loop_native(body, cols, block=name)
            if df is None:
                return None
        blocks[name] = df
    return blocks


def _parse_pairs(seg: str) -> dict:
    """Key-value lines of a non-loop block (identical typing to the
    Python machine: float when parseable, int when integral and
    dot-free)."""
    pairs: dict = {}
    for raw in seg.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or not line.startswith("_"):
            continue
        parts = _tokenize(line)
        key = parts[0][1:]
        val = parts[1] if len(parts) > 1 else ""
        try:
            num = float(val)
            val = (
                int(num)
                if np.isfinite(num) and num == int(num) and "." not in str(val)
                else num
            )
        except (ValueError, TypeError, OverflowError):
            pass
        pairs[key] = val
    return pairs


def _read_star_python(text: str):
    """Line-machine reference parser (also the fallback for quoted or
    unusually shaped files)."""
    blocks: dict = {}
    name = None
    mode = None  # None | "loop_header" | "loop_rows" | "pairs"
    cols: list = []
    rows: list = []
    pairs: dict = {}
    loop_idx = 0  # loop_ tables seen in the current data_ block

    def flush():
        nonlocal cols, rows, pairs
        if name is None:
            cols, rows, pairs = [], [], {}
            return
        # a block's 2nd+ loop table keys as "<name>#loop<k>" instead of
        # silently overwriting (and thus losing) the earlier table
        key_name = name if loop_idx <= 1 else f"{name}#loop{loop_idx}"
        if cols:
            # rows holds RAW lines; per-token work happens here, in the
            # native codec when available, else the Python tokenizer
            df = _parse_loop_native(rows, cols, block=name)
            if df is None:
                toks = []
                for irow, line in enumerate(rows):
                    vals = _tokenize(line)
                    if len(vals) != len(cols):
                        # fail loudly like the reference's starfile does
                        # on malformed input — a silently truncated
                        # table corrupts the pipeline
                        raise ValueError(
                            f"STAR loop row has {len(vals)} tokens but "
                            f"the header declares {len(cols)} columns "
                            f"(block 'data_{name}', row {irow + 1}): "
                            f"{line!r}"
                        )
                    toks.append(vals)
                df = pd.DataFrame(toks, columns=cols)
                for c in df.columns:
                    df[c] = _coerce(df[c])
            blocks[key_name] = df
        elif pairs:
            blocks[key_name] = dict(pairs)
        cols, rows, pairs = [], [], {}

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("data_"):
            flush()
            name = line[5:]
            mode = "pairs"
            loop_idx = 0
            continue
        if line.startswith("loop_"):
            if cols and rows:
                flush()  # preserve the block's previous loop table
            mode = "loop_header"
            loop_idx += 1
            cols = []
            rows = []
            continue
        if mode == "loop_header" and line.startswith("_"):
            cols.append(line.split()[0][1:])
            continue
        if mode in ("loop_header", "loop_rows") and not line.startswith("_"):
            mode = "loop_rows"
            rows.append(line)
            continue
        if line.startswith("_"):
            parts = _tokenize(line)
            key = parts[0][1:]
            val = parts[1] if len(parts) > 1 else ""
            try:
                num = float(val)
                val = (
                    int(num)
                    if np.isfinite(num) and num == int(num) and "." not in str(val)
                    else num
                )
            except (ValueError, TypeError, OverflowError):
                pass
            pairs[key] = val
            continue
    flush()
    return blocks


def _fmt(v) -> str:
    if isinstance(v, (float, np.floating)):
        return f"{v:.6f}"
    return str(v)


def _format_rows_native(df: pd.DataFrame) -> str | None:
    """Loop-table body via the C++ formatter; None -> Python fallback.

    Identical output to the vectorized Python path: floats "%.6f", ints
    unpadded, everything else str(). Float columns with |v| >= 1e15 are
    routed through Python formatting (the C side uses a fixed 32-char
    field).
    """
    from ..native import load_star_codec

    lib = load_star_codec()
    nrows = len(df)
    if lib is None or nrows == 0:
        return None
    import ctypes

    ncols = len(df.columns)
    kind = np.empty(ncols, np.int8)
    dcols, icols, scols = [], [], []
    for j, c in enumerate(df.columns):
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            vals = s.to_numpy(np.float64)
            finite = np.isfinite(vals)
            if finite.any() and (np.abs(vals[finite]) >= 1e15).any():
                scols.append(s.map("{:.6f}".format).astype(str))
                kind[j] = 2
            else:
                dcols.append(vals)
                kind[j] = 0
        elif pd.api.types.is_integer_dtype(s):
            if (
                pd.api.types.is_unsigned_integer_dtype(s)
                and len(s)
                and int(s.max()) > np.iinfo(np.int64).max
            ):
                # uint64 above 2^63 (cryoSPARC uids): to_numpy(int64)
                # would WRAP to negative; format as strings instead,
                # matching the pure-Python fallback
                scols.append(s.astype(str))
                kind[j] = 2
            else:
                icols.append(s.to_numpy(np.int64))
                kind[j] = 1
        else:
            scols.append(s.astype(str))
            kind[j] = 2
    d_mat = (
        np.ascontiguousarray(np.stack(dcols)) if dcols else np.empty((1, 1))
    )
    i_mat = (
        np.ascontiguousarray(np.stack(icols))
        if icols
        else np.empty((1, 1), np.int64)
    )
    if scols:
        joined = [v.to_numpy() for v in scols]
        flat = []
        starts = np.empty((len(scols), nrows), np.int64)
        lens = np.empty((len(scols), nrows), np.int32)
        pos = 0
        parts = []
        for k, arr in enumerate(joined):
            for r, v in enumerate(arr):
                b = v.encode("utf-8") if isinstance(v, str) else str(v).encode()
                parts.append(b)
                starts[k, r] = pos
                lens[k, r] = len(b)
                pos += len(b)
        strbuf = b"".join(parts)
        del flat
    else:
        strbuf = b""
        starts = np.empty((1, 1), np.int64)
        lens = np.empty((1, 1), np.int32)
    cap = int(
        len(strbuf) + 32 * d_mat.size + 24 * i_mat.size + nrows * (ncols + 2) + 64
    )
    out = ctypes.create_string_buffer(cap)
    n = lib.star_format(
        nrows, ncols,
        kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        d_mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        i_mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        strbuf,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out, cap,
    )
    if n < 0:
        return None
    return out.raw[:n].decode("utf-8")


def write_star(path_or_buffer, blocks):
    """Write {block_name: DataFrame | dict} as STAR.

    A bare DataFrame is accepted and written as ``data_``.
    """
    if isinstance(blocks, pd.DataFrame):
        blocks = {"": blocks}
    out = _io.StringIO()
    out.write("# version 30001\n")
    for name, content in blocks.items():
        out.write(f"\ndata_{name}\n\n")
        if isinstance(content, dict):
            for k, v in content.items():
                out.write(f"_{k}\t{_fmt(v)}\n")
            continue
        df = content
        out.write("loop_\n")
        for i, c in enumerate(df.columns):
            out.write(f"_{c} #{i + 1}\n")
        # native C++ row formatter when available; else column-wise
        # vectorized formatting (a per-row iterrows loop is ~20x slower
        # on 100k-row tables)
        body_text = _format_rows_native(df) if len(df.columns) else None
        if body_text is not None:
            out.write(body_text)
            continue
        cols = []
        for c in df.columns:
            s = df[c]
            if pd.api.types.is_float_dtype(s):
                cols.append(s.map("{:.6f}".format).to_numpy())
            else:
                cols.append(s.astype(str).to_numpy())
        if cols:
            body = cols[0]
            for col in cols[1:]:
                body = np.char.add(np.char.add(body.astype(str), " "), col.astype(str))
            out.write("\n".join(body))
            out.write("\n")
    text = out.getvalue()
    if hasattr(path_or_buffer, "write"):
        path_or_buffer.write(text)
    else:
        Path(path_or_buffer).write_text(text)
