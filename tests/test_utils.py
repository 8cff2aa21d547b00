"""Tests for the utils layer: param language, collections, logging, paths."""

import datetime
import math

import numpy as np
import pytest

import helicon_tpu as ht


class TestParamLanguage:
    def test_get_option_list(self):
        argv = ["prog", "in.star", "--select", "x", "--apix=1.2", "-v", "--select"]
        assert ht.get_option_list(argv) == ["select", "apix", "select"]

    def test_parse_param_str(self):
        name, d = ht.parse_param_str("helical_sym:twist=1.2:rise=4.75:csym=2")
        assert name == "helical_sym"
        assert d == {"twist": 1.2, "rise": 4.75, "csym": 2}

    def test_parse_param_no_name(self):
        name, d = ht.parse_param_str("a=1:b=hello:c=true:d=false")
        assert name is None
        assert d == {"a": 1, "b": "hello", "c": 1, "d": 0}

    def test_parse_param_quoted(self):
        _, d = ht.parse_param_str('k="1,2,3"')
        assert d == {"k": "1,2,3"}

    def test_validate_param_dict(self):
        final, changed, unsupported = ht.validate_param_dict(
            {"twist": "1.5", "bogus": 3}, {"twist": 0.0, "rise": 4.75}
        )
        assert final == {"twist": 1.5, "rise": 4.75}
        assert changed == {"twist": 1.5}
        assert unsupported == {"bogus": 3}


class TestCollections:
    def test_unique(self):
        assert ht.unique([3, 1, 3, 2, 1]) == [3, 1, 2]

    def test_flatten(self):
        assert ht.flatten([1, [2, [3, 4]], (5,)]) == [1, 2, 3, 4, 5]
        assert ht.flatten((1, (2, 3))) == (1, 2, 3)
        assert ht.flatten([1, [], 2]) == [1, 2]

    def test_split_array(self):
        arr = [10, 10, 1, 1]
        g1, g2 = ht.split_array(arr)
        assert abs(sum(arr[i] for i in g1) - sum(arr[i] for i in g2)) <= 2
        assert sorted(g1 + g2) == [0, 1, 2, 3]

    def test_assign_to_groups(self):
        groups = ht.assign_to_groups([1, 1, 2, 3, 4, 5], group_size=2)
        assert groups[1] == 1
        assert len(set(groups.values())) >= 2

    def test_unique_attr_name(self):
        assert ht.unique_attr_name({"a": 1}, "b") == "b"
        assert ht.unique_attr_name({"b": 1, "b2": 1}, "b") == "b3"

    def test_first_matched_attr(self):
        assert ht.first_matched_attr({"x": 1, "y": 2}, ["z", "y", "x"]) == "y"
        assert ht.first_matched_attr({}, ["z"]) is None

    def test_all_matched_attrs(self, relion_df):
        cols = ht.all_matched_attrs(relion_df, "Defocus")
        assert set(cols) == {"rlnDefocusU", "rlnDefocusV", "rlnDefocusAngle"}

    def test_dotdict(self):
        d = ht.DotDict(a=1)
        d.b = 2
        assert d.a == 1 and d["b"] == 2
        with pytest.raises(AttributeError):
            _ = d.missing

    def test_order_by_unique_counts(self):
        labels = np.array([5, 5, 5, 7, 7, 9, -1])
        out = ht.order_by_unique_counts(labels)
        assert out[:3] == [0, 0, 0] and out[-1] == -1


class TestLoggingUtils:
    def test_timer(self, caplog):
        with ht.Timer("stage", verbose=False) as t:
            pass
        assert t.elapsed >= 0

    def test_timedelta2string(self):
        td = datetime.timedelta(hours=1, minutes=2, seconds=3.5)
        s = ht.timedelta2string(td)
        assert "1h" in s and "2m" in s

    def test_getlogger(self, tmp_path):
        logger = ht.getLogger(str(tmp_path / "x.log"), verbose=2, name="t1")
        logger.info("hello")
        assert (tmp_path / "x.log").exists()


class TestSystem:
    def test_available_cpu(self):
        assert ht.available_cpu() >= 1

    def test_bytes2units(self):
        val, unit = ht.bytes2units(1536 * 1024**2)
        assert unit == "GB" and val == pytest.approx(1.5)
        val, unit = ht.bytes2units(2048, to="k")
        assert unit == "kB" and val == 2.0

    def test_ceil_power_of_10(self):
        assert ht.ceil_power_of_10(5) == 10
        assert ht.ceil_power_of_10(10) == 10
        assert ht.ceil_power_of_10(11) == 100
        with pytest.raises(ValueError):
            ht.ceil_power_of_10(-1)

    def test_encode_numpy(self, rng):
        url = ht.encode_numpy(rng.uniform(size=(8, 8)))
        assert url.startswith("data:image/jpeg;base64,")


class TestPathUtils:
    def test_which(self):
        assert ht.which("sh") is not None
        assert ht.which("definitely_not_a_binary_xyz") is None

    def test_get_direct_url(self):
        assert (
            ht.get_direct_url("https://drive.google.com/file/d/ABC123/view")
            == "https://drive.google.com/uc?export=download&id=ABC123"
        )
        assert ht.get_direct_url("https://www.dropbox.com/s/x/f.mrc?dl=0").endswith("dl=1")
        assert ht.get_direct_url("https://example.com/f.mrc") == "https://example.com/f.mrc"

    def test_get_emdb_id(self):
        assert ht.get_emdb_id("maps/EMD-14046.map") == "EMD-14046"
        assert ht.get_emdb_id("emd_1234") == "emd_1234"
        assert ht.get_emdb_id("nothing") is None

    def test_file_ready(self, tmp_path):
        f = tmp_path / "a.txt"
        assert ht.file_ready(str(f)) == 0
        f.write_text("data")
        assert ht.file_ready(str(f)) == 1
        assert ht.file_ready([str(f)]) == 1

    def test_is_file_readable_writable(self, tmp_path):
        f = tmp_path / "a.txt"
        f.write_text("x")
        assert ht.is_file_readable(str(f))
        assert ht.is_file_writable(str(f))
        assert not ht.is_file_readable(str(tmp_path / "missing"))

    def test_check_required_columns(self, relion_df):
        ht.check_required_columns(relion_df, ["rlnImageName"])
        with pytest.raises(ValueError):
            ht.check_required_columns(relion_df, ["rlnMissing"])

    def test_convert_file_path(self, tmp_path, monkeypatch):
        import pandas as pd

        monkeypatch.chdir(tmp_path)
        (tmp_path / "sub").mkdir()
        f = tmp_path / "sub" / "a.mrc"
        f.write_text("x")
        s = pd.Series(["sub/a.mrc"])
        out = ht.convert_file_path(s, to="abs")
        assert out.iloc[0] == str(f)
        back = ht.convert_file_path(out, to="rel")
        assert back.iloc[0] == "sub/a.mrc"


class TestCache:
    def test_cache_decorator(self, tmp_path):
        calls = []

        @ht.cache(cache_dir=tmp_path, expires_after=7)
        def expensive(x):
            calls.append(x)
            return x * 2

        assert expensive(3) == 6
        assert expensive(3) == 6
        assert len(calls) == 1

    def test_cache_ignore(self, tmp_path):
        calls = []

        @ht.cache(cache_dir=tmp_path, ignore=["verbose"])
        def fn(x, verbose=0):
            calls.append((x, verbose))
            return x

        fn(1, verbose=0)
        fn(1, verbose=5)
        assert len(calls) == 1


class TestExceptions:
    def test_hierarchy(self):
        assert issubclass(ht.HeliconValueError, ht.HeliconError)
        assert issubclass(ht.HeliconValueError, ValueError)
        assert issubclass(ht.HeliconExit, SystemExit)
        with pytest.raises(ht.HeliconError):
            raise ht.HeliconIOError("x")


def test_timedelta2string_accepts_plain_seconds():
    """Reference logging.py:133 takes float seconds; ours must accept
    both (the denovo3D app passes eta_seconds directly)."""
    import datetime

    from helicon_tpu.utils.logging import timedelta2string

    assert timedelta2string(3723.0) == timedelta2string(
        datetime.timedelta(seconds=3723)
    )


def test_cache_decorator_degrades_without_joblib(monkeypatch, tmp_path):
    """joblib is optional: its absence must degrade to pass-through, and
    the DummyMemory path must not create an inspect wrapper loop."""
    import builtins
    import importlib
    import inspect

    c = importlib.import_module("helicon_tpu.utils.cache")

    real_import = builtins.__import__

    def no_joblib(name, *a, **k):
        if name == "joblib" or name.startswith("joblib."):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_joblib)

    @c.cache(cache_dir=tmp_path / "cc")
    def f(x):
        return x + 1

    assert f(1) == 2
    inspect.signature(f)  # must not raise 'wrapper loop'
    inspect.unwrap(f)


def test_get_context_function_name_names_the_caller():
    from helicon_tpu.utils.system import get_context_function_name

    def inner():
        return get_context_function_name()

    def outer():
        return inner()

    assert outer() == "inner"


def test_helicon_no_native_zero_means_enabled(monkeypatch):
    """HELICON_NO_NATIVE=0/false means the native codec stays ENABLED."""
    import helicon_tpu.native as native

    monkeypatch.setenv("HELICON_NO_NATIVE", "1")
    assert native.load_star_codec() is None
    monkeypatch.setenv("HELICON_NO_NATIVE", "0")
    # returns the codec handle or None-if-uncompilable, but must NOT be
    # rejected by the env check itself: compare against the unset case
    monkeypatch.setenv("HELICON_NO_NATIVE", "")
    unset_result = native.load_star_codec()
    monkeypatch.setenv("HELICON_NO_NATIVE", "0")
    assert type(native.load_star_codec()) is type(unset_result)
