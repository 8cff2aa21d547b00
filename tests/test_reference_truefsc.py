"""End-to-end trueFSC golden parity vs the ACTUAL reference command
(VERDICT r3 #9).

Runs the reference's full trueFSC chain (/root/reference/src/helicon/
commands/trueFSC.py:25-410 — unmasked FSC, cutoff pick, phase
randomization, adaptive mask + soft-width search, FSCtrue correction)
on fixture half-maps with its unavailable deps stubbed (mrcfile shim
backed by our native MRC reader), runs our helicon_tpu trueFSC on the
same inputs, and asserts:

- the unmasked FSC curves agree tightly (deterministic math), and
- the FSCtrue curves agree within a statistical tolerance (phase
  randomization draws different random phases on each side), and
- both report the same FSC=0.143 resolution within one Fourier shell.

Skipped when /root/reference is not present.
"""

import argparse
import os
import sys
import types
import warnings

import numpy as np
import pytest

REF = "/root/reference/src"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not available"
    ),
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def ref_truefsc():
    sys.path.insert(0, REF)
    for name in [
        "starfile", "numba", "finufft", "quaternionic", "xmltodict",
        "shiny", "tqdm", "numba.core", "numba.core.errors",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    nb = sys.modules["numba"]

    def _jit(*a, **k):
        def deco(f):
            return f

        return deco

    if not hasattr(nb, "jit"):
        nb.jit = _jit
        nb.njit = _jit
        nb.prange = range
        nb.set_num_threads = lambda n: None
    if not hasattr(sys.modules["numba.core.errors"], "NumbaPendingDeprecationWarning"):
        sys.modules["numba.core.errors"].NumbaPendingDeprecationWarning = Warning
    if not hasattr(sys.modules["tqdm"], "tqdm"):
        sys.modules["tqdm"].tqdm = lambda x, **k: x

    # mrcfile shim backed by our native MRC2014 reader (the reference
    # only touches .data and .voxel_size.x in trueFSC)
    if "mrcfile" not in sys.modules or not hasattr(
        sys.modules["mrcfile"], "open"
    ):
        mf = sys.modules.setdefault("mrcfile", types.ModuleType("mrcfile"))

        class _Vx:
            def __init__(self, a):
                self.x = a

        class _Mrc:
            def __init__(self, path):
                from helicon_tpu.io.mrc import read_mrc

                data, apix = read_mrc(path)[:2]
                self.data = np.asarray(data)
                self.voxel_size = _Vx(apix)

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        mf.open = lambda path, **k: _Mrc(path)

        class _NewMrc:
            def __init__(self, path):
                self.path = path
                self._data = None
                self.voxel_size = 1.0

            def set_data(self, data):
                self._data = np.asarray(data)

            def __enter__(self):
                return self

            def __exit__(self, *a):
                from helicon_tpu.io.mrc import write_mrc

                if self._data is not None:
                    vx = self.voxel_size
                    apix = float(getattr(vx, "x", vx))
                    write_mrc(self.path, self._data.astype(np.float32), apix=apix)
                return False

        mf.new = lambda path, overwrite=True, **k: _NewMrc(path)

    import matplotlib

    matplotlib.use("Agg")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from helicon.commands import trueFSC as ref

    return ref


@pytest.fixture(scope="module")
def half_maps(tmp_path_factory):
    """Two independently-noisy copies of a structured synthetic map."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import helicon_tpu as ht
    from helicon_tpu.io.mrc import write_mrc

    n, apix = 48, 1.5
    base = np.zeros((n, n, n), np.float32)
    base[16:32, 22:26, 20:28] = 1.0
    base[20:28, 14:34, 22:26] += 0.8
    sym = np.asarray(
        ht.apply_helical_symmetry(
            base, apix=apix, twist_degree=35.0, rise_angstrom=6.0, csym=2,
            new_size=(n, n, n), new_apix=apix,
        ),
        np.float32,
    )
    sym = np.asarray(
        ht.low_high_pass_filter(sym, low_pass_fraction=2 * apix / 5.0),
        np.float32,
    )
    rng = np.random.default_rng(7)
    sig = float(sym.std())
    d = tmp_path_factory.mktemp("truefsc")
    paths = []
    for i in range(2):
        half = sym + rng.normal(scale=0.25 * sig, size=sym.shape).astype(
            np.float32
        )
        p = d / f"half{i + 1}.mrc"
        write_mrc(p, half.astype(np.float32), apix=apix)
        paths.append(str(p))
    return paths, float(apix)


def _run(mod, maps, out_png):
    parser = argparse.ArgumentParser()
    mod.add_args(parser)
    args = parser.parse_args([maps[0], maps[1], out_png])
    args.verbose = 0
    args.showPlot = 0
    mod.main(args)
    prefix = os.path.splitext(out_png)[0]
    curves = {}
    for tag in ("unmasked", "true"):
        curves[tag] = np.loadtxt(f"{prefix}.{tag}.txt")
    return curves


def test_truefsc_chain_matches_reference(ref_truefsc, half_maps, tmp_path):
    import helicon_tpu.commands.trueFSC as mine

    maps, apix = half_maps
    ref_curves = _run(ref_truefsc, maps, str(tmp_path / "ref.png"))
    my_curves = _run(mine, maps, str(tmp_path / "mine.png"))

    # deterministic unmasked FSC: same shells, tight agreement
    r_u, m_u = ref_curves["unmasked"], my_curves["unmasked"]
    assert r_u.shape == m_u.shape
    np.testing.assert_allclose(m_u[:, 0], r_u[:, 0], atol=1e-9)
    np.testing.assert_allclose(m_u[:, 1], r_u[:, 1], atol=2e-3)

    # FSCtrue: different random phase draws + independently derived
    # adaptive masks -> statistical agreement in the resolved band
    r_t, m_t = ref_curves["true"], my_curves["true"]
    assert r_t.shape[0] == m_t.shape[0]
    resolved = r_t[:, 1] > 0.3
    assert np.abs(m_t[resolved, 1] - r_t[resolved, 1]).max() < 0.1

    # same FSC=0.143 resolution within one Fourier shell
    res_ref = mine._find_resolution(r_t[:, 0], r_t[:, 1], 0.143)
    res_mine = mine._find_resolution(m_t[:, 0], m_t[:, 1], 0.143)
    shell = abs(1.0 / res_ref - 1.0 / res_mine)
    assert shell <= 1.0 / (48 * apix) + 1e-9, (res_ref, res_mine)
