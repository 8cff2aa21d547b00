"""Native C++ STAR codec (helicon_tpu/native/star_codec.cpp) vs the pure
Python path: byte-identical writer output, frame-identical reader output,
identical loud malformed-row errors, and graceful fallback when disabled
(HELICON_NO_NATIVE=1)."""

import io
import subprocess
import sys
import textwrap

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.io.star import read_star, write_star
from helicon_tpu.native import load_star_codec

pytestmark = pytest.mark.skipif(
    load_star_codec() is None, reason="native codec unavailable (no g++?)"
)


def _sample_frame(n=500):
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        dict(
            rlnImageName=[f"{i % 50 + 1:06d}@s_{i // 50:04d}.mrcs" for i in range(n)],
            rlnCoordinateX=rng.uniform(0, 4000, n),
            rlnClassNumber=rng.integers(1, 51, n),
            rlnAnglePsi=rng.uniform(-180, 180, n),
        )
    )


def _python_path(fn, *args):
    """Run fn with the native codec disabled (fresh process env knob is
    overkill — the loader checks HELICON_NO_NATIVE at call time)."""
    import os

    os.environ["HELICON_NO_NATIVE"] = "1"
    try:
        return fn(*args)
    finally:
        del os.environ["HELICON_NO_NATIVE"]


def test_writer_output_byte_identical():
    df = _sample_frame()
    a, b = io.StringIO(), io.StringIO()
    write_star(a, {"particles": df})
    _python_path(write_star, b, {"particles": df})
    assert a.getvalue() == b.getvalue()


def test_reader_frames_identical():
    df = _sample_frame()
    buf = io.StringIO()
    write_star(buf, {"particles": df})
    text = buf.getvalue()
    fast = read_star(io.StringIO(text))["particles"]
    slow = _python_path(read_star, io.StringIO(text))["particles"]
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["rlnClassNumber"].dtype == np.int64
    assert fast["rlnCoordinateX"].dtype == np.float64


def test_reader_typing_edge_cases():
    text = textwrap.dedent("""\
        data_x
        loop_
        _a #1
        _b #2
        _c #3
        # a comment inside the rows
        1.5 007 0x1A
        -2e3 8 nan
        inf 9 plain
        """)
    fast = read_star(io.StringIO(text))["x"]
    slow = _python_path(read_star, io.StringIO(text))["x"]
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["a"].dtype == np.float64          # inf stays float
    assert fast["b"].dtype == np.int64            # "007" -> 7
    assert str(fast["c"].dtype) in ("object", "str", "string")  # 0x1A / nan stay strings


def test_malformed_row_error_identical():
    text = "data_x\nloop_\n_a #1\n_b #2\n1 2\n3\n"
    with pytest.raises(ValueError, match="2 tokens.*declares 2|1 tokens"):
        read_star(io.StringIO(text))
    with pytest.raises(ValueError) as fast_err:
        read_star(io.StringIO(text))
    with pytest.raises(ValueError) as slow_err:
        _python_path(read_star, io.StringIO(text))
    assert str(fast_err.value) == str(slow_err.value)


def test_quoted_tokens_fall_back_to_shlex():
    text = 'data_x\nloop_\n_a #1\n_b #2\n"hello world" 2\n'
    df = read_star(io.StringIO(text))["x"]
    assert df["a"].iloc[0] == "hello world" and df["b"].iloc[0] == 2


def test_pairs_and_multiblock():
    text = textwrap.dedent("""\
        data_optics
        _rlnVoltage 300.000000
        _rlnImagePixelSize 1.05
        _rlnName  abc

        data_particles
        loop_
        _x #1
        1.0
        2.0
        """)
    fast = read_star(io.StringIO(text))
    slow = _python_path(read_star, io.StringIO(text))
    assert fast["optics"] == slow["optics"]
    assert fast["optics"]["rlnVoltage"] == 300
    pd.testing.assert_frame_equal(fast["particles"], slow["particles"])


def test_empty_loop_and_empty_block():
    text = "data_a\nloop_\n_x #1\n_y #2\n\ndata_b\n_k 1\n"
    fast = read_star(io.StringIO(text))
    slow = _python_path(read_star, io.StringIO(text))
    assert list(fast["a"].columns) == ["x", "y"] and len(fast["a"]) == 0
    assert list(slow["a"].columns) == ["x", "y"] and len(slow["a"]) == 0
    assert fast["b"] == slow["b"] == {"k": 1}


def test_roundtrip_with_special_floats():
    df = pd.DataFrame(dict(v=[1.5, float("nan"), float("inf"), -0.0],
                           w=[1, 2, 3, 4]))
    a, b = io.StringIO(), io.StringIO()
    write_star(a, {"": df})
    _python_path(write_star, b, {"": df})
    assert a.getvalue() == b.getvalue()


def test_huge_floats_route_through_python_formatting():
    df = pd.DataFrame(dict(v=[1e18, 2.5]))
    a, b = io.StringIO(), io.StringIO()
    write_star(a, {"": df})
    _python_path(write_star, b, {"": df})
    assert a.getvalue() == b.getvalue()


@pytest.mark.slow
def test_no_native_env_disables_codec():
    code = (
        "import os; os.environ['HELICON_NO_NATIVE']='1';"
        "from helicon_tpu.native import load_star_codec;"
        "assert load_star_codec() is None; print('ok')"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo")
    assert r.returncode == 0 and "ok" in r.stdout


def test_large_int64_column_exact_both_paths():
    """Integers above 2^53 must not be rounded through float64: the
    native path falls back to exact pd.to_numeric for such columns."""
    big = 2**53 + 1
    text = f"data_x\nloop_\n_a #1\n{big}\n{big + 2}\n"
    fast = read_star(io.StringIO(text))["x"]
    slow = _python_path(read_star, io.StringIO(text))["x"]
    pd.testing.assert_frame_equal(fast, slow)
    assert int(fast["a"].iloc[0]) == big  # exact, not 2^53


def test_empty_loop_dtypes_match_python_path():
    text = "data_a\nloop_\n_x #1\n_y #2\n"
    fast = read_star(io.StringIO(text))["a"]
    slow = _python_path(read_star, io.StringIO(text))["a"]
    pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.slow
def test_unwritable_cache_dir_falls_back_to_python(tmp_path):
    """A read-only cache location must degrade to the pure-Python parser,
    not crash read_star (module docstring contract)."""
    ro = tmp_path / "ro"
    ro.mkdir()
    ro.chmod(0o500)
    code = (
        "import io; from helicon_tpu.io.star import read_star;"
        "b = read_star(io.StringIO('data_x\\nloop_\\n_a #1\\n1.5\\n'));"
        "assert float(b['x']['a'].iloc[0]) == 1.5; print('ok')"
    )
    import os

    env = dict(os.environ, HELICON_NATIVE_CACHE=str(ro / "nested"))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd="/root/repo")
    ro.chmod(0o700)
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-2000:]


def test_locale_independent_codec():
    """strtod/printf honor LC_NUMERIC; the codec must not (it uses
    from_chars/to_chars). Skipped when no comma-decimal locale exists."""
    import locale

    code = """
import locale, io, sys
found = None
for loc in ("de_DE.UTF-8", "fr_FR.UTF-8", "de_DE.utf8"):
    try:
        locale.setlocale(locale.LC_NUMERIC, loc); found = loc; break
    except locale.Error:
        pass
if not found:
    print("NOLOCALE"); sys.exit(0)
from helicon_tpu.io.star import read_star, write_star
import pandas as pd
df = pd.DataFrame(dict(v=[1.5, -2.25]))
buf = io.StringIO(); write_star(buf, {"": df})
assert "1.500000" in buf.getvalue(), buf.getvalue()
back = read_star(io.StringIO(buf.getvalue()))[""]
assert float(back["v"].iloc[0]) == 1.5
print("ok")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    if "NOLOCALE" in r.stdout:
        pytest.skip("no comma-decimal locale installed")
    assert "ok" in r.stdout


def test_marker_style_combinations_do_not_repeat_early():
    """10 palette colors x 14 glyphs cycle independently: the (color,
    symbol) pair of overlay i must be unique for the first lcm(10,14)=70
    overlays (a truncated glyph table once made i and i+10 identical)."""
    from helicon_tpu.webApps.whereIsMyClass.compute import _MARKER_GLYPHS

    assert len(_MARKER_GLYPHS) == 14
    pairs = {(i % 10, i % len(_MARKER_GLYPHS)) for i in range(70)}
    assert len(pairs) == 70


def test_multi_loop_block_preserves_both_tables():
    """A data_ block with two loop_ tables keeps BOTH (the second keys
    as '<name>#loop2'); the line machine previously discarded the first."""
    text = "data_x\nloop_\n_c1 #1\n_c2 #2\n1 2\n3 4\nloop_\n_d1 #1\n5\n6\n"
    blocks = read_star(io.StringIO(text))
    assert list(blocks["x"].columns) == ["c1", "c2"] and len(blocks["x"]) == 2
    assert list(blocks["x#loop2"].columns) == ["d1"]
    assert blocks["x#loop2"]["d1"].tolist() == [5, 6]


def test_uint64_above_int63_not_wrapped(tmp_path):
    """cryoSPARC uids above 2^63 must survive write_star regardless of
    which formatter (C++ or Python) runs — int64 conversion wrapped
    them to negative numbers on the native path."""
    import pandas as pd

    big = np.uint64(2**63 + 5)
    df = pd.DataFrame({"rlnA": np.array([big, np.uint64(7)], np.uint64),
                       "rlnB": [1.5, 2.5]})
    out = tmp_path / "u.star"
    write_star(out, {"particles": df})
    text = out.read_text()
    assert str(int(big)) in text
    assert "-922337" not in text
    back = read_star(out)["particles"]
    assert int(back["rlnA"].iloc[0]) == int(big)
