"""Tests for alignment, point_group, clustering, gauss, curvelet aliases,
and the whereIsMyClass compute layer."""

import numpy as np
import pytest

import helicon_tpu as ht


# ---------------------------------------------------------------- alignment


def test_phase_cross_correlation_recovers_shift():
    from helicon_tpu.core.alignment import phase_cross_correlation

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((64, 64)).astype(np.float32)
    mov = np.roll(np.roll(ref, -5, axis=0), 3, axis=1)
    shift, _, _ = phase_cross_correlation(ref, mov)
    # applying `shift` to mov aligns it with ref
    assert tuple(shift.astype(int)) == (5, -3)


@pytest.mark.slow
def test_align_images_recovers_rotation():
    from helicon_tpu.helix import simulate_helical_projection

    img = simulate_helical_projection(
        n=1, twist=40.0, rise=8.0, csym=1, helical_diameter=40.0,
        ball_radius=6.0, polymer=0, planarity=1.0, ny=64, nx=64, apix=2.0,
        rng=0,
    ).astype(np.float32)
    rotated = np.asarray(ht.transform_image(img, rotation=8.0))
    flipped, scale, angle, shift, score = ht.align_images(
        rotated, img, scale_range=0, angle_range=15.0, check_polarity=False
    )
    assert score > 0.8
    assert abs(abs(angle) - 8.0) < 2.0 or abs(abs(angle) - 172.0) < 2.0


# ---------------------------------------------------------------- point_group


def test_point_group_orders():
    from helicon_tpu import PointGroup

    assert len(PointGroup("C1")) == 1
    assert len(PointGroup("C5")) == 5
    assert len(PointGroup("D3")) == 6
    assert len(PointGroup("T")) == 12
    assert len(PointGroup("O")) == 24
    assert len(PointGroup("I")) == 60


def test_point_group_closure_and_distance():
    from helicon_tpu import PointGroup

    g = PointGroup("C4")
    mats = g.matrices
    # closure: product of any two elements is in the group
    for a in mats:
        for b in mats:
            prod = a @ b
            assert any(np.allclose(prod, m, atol=1e-6) for m in mats)
    p = np.array([1.0, 0.0, 0.5])
    rotated = g.matrices[1] @ p
    assert g.distance_of_points(p[None], rotated[None]) < 1e-10


def test_point_group_rotations_distance():
    from scipy.spatial.transform import Rotation

    from helicon_tpu import PointGroup

    g = PointGroup("C3")
    r = Rotation.from_euler("ZYZ", [[10, 20, 30]], degrees=True)
    r_sym = Rotation.from_rotvec([[0, 0, 2 * np.pi / 3]]) * r
    assert g.distance_of_rotations(r, r_sym) < 1e-6


# ---------------------------------------------------------------- clustering


def test_clustering_min_size():
    from helicon_tpu import AgglomerativeClusteringWithMinSize

    rng = np.random.default_rng(0)
    X = np.concatenate(
        [
            rng.normal(0, 0.1, (20, 2)),
            rng.normal(5, 0.1, (20, 2)),
            rng.normal([0, 5], 0.1, (3, 2)),
        ]
    )
    model = AgglomerativeClusteringWithMinSize(
        min_cluster_size=5, n_clusters=3
    ).fit(X)
    unique, counts = np.unique(model.labels_, return_counts=True)
    assert counts.min() >= 5 or len(unique) < 3


# ---------------------------------------------------------------- gauss


def test_gaussian_models():
    from helicon_tpu import AnisotropicGaussian, IsotropicGaussian, IsotropicGaussianSet

    g = IsotropicGaussian(center=(0, 0), sigma=2.0, amplitude=3.0)
    img = g.evaluate((32, 32))
    assert img[16, 16] == pytest.approx(3.0)
    ag = AnisotropicGaussian(sigmas=(1.0, 4.0), rotation=0.0)
    img2 = ag.evaluate((32, 32))
    assert img2[16, 20] > img2[20, 16]  # wider along x
    s = IsotropicGaussianSet([g, g])
    assert s.evaluate((32, 32))[16, 16] == pytest.approx(6.0)


# ---------------------------------------------------------------- curvelet aliases


def test_curvelet_alias_surface():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    out = np.asarray(ht.curvelet_denoise_udct(img))
    assert out.shape == img.shape
    stack = rng.standard_normal((3, 32, 32)).astype(np.float32)
    outb = np.asarray(ht.curvelet_denoise_batch_udct(stack))
    assert outb.shape == stack.shape
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    out3 = np.asarray(ht.curvelet_denoise_3d_udct(vol))
    assert out3.shape == vol.shape


# ---------------------------------------------------------------- whereIsMyClass


def test_where_is_my_class_compute(relion_df):
    from helicon_tpu.webApps.whereIsMyClass import compute

    df = relion_df.copy()
    df["rlnClassNumber"] = 1
    df["rlnAnglePsi"] = 10.0
    helices = compute.select_classes(df, [0])
    assert len(helices) == 4  # 2 micrographs x 2 tubes
    lengths = compute.get_filament_length(helices)
    assert len(lengths) == 4
    dists, min_len = compute.compute_pair_distances(helices, lengths, -1)
    assert len(dists) > 0
    assert compute.estimate_inter_segment_distance(df) == pytest.approx(47.5)
    abundance = compute.get_class_abundance(df, 2)
    assert abundance[0] == len(df)


def test_micrograph_loader(tmp_path):
    from helicon_tpu.io.mrc import write_mrc
    from helicon_tpu.webApps.whereIsMyClass.compute import get_micrograph

    rng = np.random.default_rng(0)
    mic = rng.standard_normal((64, 64)).astype(np.float32)
    write_mrc(tmp_path / "m.mrc", mic, apix=1.0)
    data, tapix, apix = get_micrograph(
        tmp_path / "m.mrc", target_apix=2.0, low_pass_angstrom=10,
        high_pass_angstrom=0,
    )
    assert data.shape == (32, 32)
    assert apix == pytest.approx(1.0)


# ---------------------------------------------------------------- ctf / hill


def test_ctf_1d_properties():
    from helicon_tpu.core.ctf import ctf_1d, electron_wavelength

    assert electron_wavelength(300) == pytest.approx(0.0197, abs=2e-4)
    s = np.linspace(0, 0.5, 500)
    c = np.asarray(ctf_1d(s, defocus_um=1.0))
    assert c[0] == pytest.approx(-0.07, abs=1e-3)  # amp contrast at s=0
    assert c.min() < -0.9 and c.max() > 0.9  # oscillates fully
    # higher defocus -> first zero at lower frequency
    c2 = np.asarray(ctf_1d(s, defocus_um=3.0))
    z1 = np.argmax(c > 0)
    z2 = np.argmax(c2 > 0)
    assert z2 < z1


def test_ctf_2d_astigmatism():
    from helicon_tpu.core.ctf import ctf_2d

    c = np.asarray(
        ctf_2d((64, 64), apix=1.0, defocus_u_A=20000, defocus_v_A=10000,
               astig_angle_deg=0.0)
    )
    assert c.shape == (64, 64)
    # astigmatism: different along x vs y
    assert not np.allclose(c[0, :], c[:, 0])


def test_layer_lines():
    from helicon_tpu.core.ctf import layer_line_positions, simulate_helix_power_spectrum

    lines = layer_line_positions(twist=30.0, rise=5.0, csym=1, n_lines=5)
    assert lines[0] == (0.0, 0, 0)
    zs = [z for z, n, m in lines]
    assert all(zs[i] <= zs[i + 1] for i in range(len(zs) - 1))
    # 1-start helix: n=1 line at 1/pitch = twist/(360*rise)
    pitch = 360.0 / 30.0 * 5.0
    assert any(abs(z - 1 / pitch) < 1e-6 and n == 1 for z, n, m in lines)
    # csym=2 restricts to even Bessel orders
    lines2 = layer_line_positions(twist=30.0, rise=5.0, csym=2, n_lines=5)
    assert all(n % 2 == 0 for z, n, m in lines2)
    img = simulate_helix_power_spectrum((64, 64), 2.0, 30.0, 5.0)
    assert img.shape == (64, 64) and img.max() > 0


def test_point_group_icosahedral_conventions():
    """Reference tests/test_point_group.py behaviors."""
    from scipy.spatial.transform import Rotation

    from helicon_tpu import PointGroup

    pg = PointGroup("I")
    assert pg.distance_of_points(
        np.array([1.0, 0, 0]), np.array([-1.0, 0, 0])
    ) < 1e-10
    assert pg.distance_of_rotations(
        Rotation.identity(), Rotation.from_rotvec([0, 0, 2 * np.pi / 5])
    ) < 1e-6
    rot = PointGroup.get_icosahedral_conversion_rotation("I_5z2x", "I_2z2x5y")
    phi = (1 + np.sqrt(5)) / 2
    target = np.array([0, 1, phi]) / np.linalg.norm([0, 1, phi])
    np.testing.assert_allclose(rot.apply([0, 0, 1.0]), target, atol=1e-10)
    for alias, full in {
        "I1": "I_2z2x5y", "I2": "I_2z2x5x", "I3": "I_5z2y", "I4": "I_5z2x"
    }.items():
        m1, m2 = PointGroup(alias).matrices, PointGroup(full).matrices
        assert len(m1) == len(m2) == 60
        assert all(
            any(np.allclose(x, y, atol=1e-6) for y in m2) for x in m1
        )
    # case insensitivity
    assert len(PointGroup("c2")) == len(PointGroup("C2"))
    assert len(PointGroup("i")) == 60


def test_batched_cross_correlation():
    from helicon_tpu.core.xcorr import batched_cross_correlation

    rng = np.random.default_rng(0)
    classes = rng.standard_normal((3, 32, 32)).astype(np.float32)
    # segments: shifted copies of class 1 + noise-only
    seg0 = np.roll(classes[1], (4, -3), axis=(0, 1))
    seg1 = rng.standard_normal((32, 32)).astype(np.float32)
    peak, shifts = batched_cross_correlation(classes, np.stack([seg0, seg1]))
    assert peak.shape == (3, 2)
    assert np.argmax(peak[:, 0]) == 1  # class 1 matches segment 0
    assert peak[1, 0] > 0.99
    # shift to apply to the segment to align it with the class
    assert tuple(np.asarray(shifts[1, 0])) == (-4, 3)
    assert peak[1, 1] < 0.5


class TestWhereIsMyClassReference:
    """Ported from reference tests/test_whereIsMyClass_compute.py."""

    def test_project_root_dir(self):
        import pandas as pd

        from helicon_tpu.webApps.whereIsMyClass import compute

        r = compute.get_project_root_dir("/a/b/c/JobName/run_it020_data.star")
        assert r is not None and r.name == "b"
        r = compute.get_project_root_dir("/a/b/c/J123/J456/run_it020.cs")
        assert r is not None and r.name == "J123"
        assert compute.get_project_root_dir("/a/b/c/file.txt") is None

    def test_class_file_paths(self):
        from helicon_tpu.webApps.whereIsMyClass import compute

        r = compute.get_class_file("/a/b/c/JobName/run_it020_data.star")
        assert r.suffix == ".mrcs" and "classes" in r.name
        r = compute.get_class_file("/a/b/c/J123/run_it020.cs")
        assert r.suffix == ".mrc" and "class_averages" in r.name
        assert compute.get_class_file("/a/b/c/file.txt") is None

    def test_filament_length_and_distances(self):
        import pandas as pd

        from helicon_tpu.webApps.whereIsMyClass import compute

        helices = [
            (
                ("m1", 1),
                pd.DataFrame(
                    {
                        "rlnClassNumber": [1, 1, 1],
                        "rlnHelicalTrackLengthAngst": [0.0, 100.0, 200.0],
                        "rlnAnglePsi": [0.0, 0.0, 0.0],
                    }
                ),
            )
        ]
        assert compute.get_filament_length(helices) == [200.0]
        dists, min_len = compute.compute_pair_distances(helices)
        assert len(dists) > 0 and np.all(np.diff(dists) >= 0) and min_len == 0
        # psi 10 vs 190 wrap to the same polarity class (diff mod 180 = 0)
        helices2 = [
            (
                ("m1", 1),
                pd.DataFrame(
                    {
                        "rlnClassNumber": [1, 1, 1],
                        "rlnHelicalTrackLengthAngst": [0.0, 100.0, 200.0],
                        "rlnAnglePsi": [10.0, 10.0, 190.0],
                    }
                ),
            )
        ]
        dists2, _ = compute.compute_pair_distances(helices2)
        assert len(dists2) > 0
        assert compute.compute_pair_distances([]) == ([], 0)

    def test_inter_segment_median(self):
        import pandas as pd

        from helicon_tpu.webApps.whereIsMyClass import compute

        data = pd.DataFrame(
            {
                "rlnMicrographName": ["m1"] * 3,
                "rlnHelicalTubeID": [1] * 3,
                "rlnHelicalTrackLengthAngst": [0.0, 100.0, 300.0],
            }
        )
        assert compute.estimate_inter_segment_distance(data) == 150.0


def test_point_group_relion_aliases_matrix_sets():
    """I1..I4 aliases produce the same matrix SET as their full names
    (reference tests/test_point_group.py:169-183)."""
    from helicon_tpu import PointGroup

    aliases = {"I1": "I_2z2x5y", "I2": "I_2z2x5x", "I3": "I_5z2y", "I4": "I_5z2x"}
    for a, full in aliases.items():
        m1 = PointGroup(a).matrices
        m2 = PointGroup(full).matrices
        assert len(m1) == len(m2) == 60
        for mat1 in m1:
            assert any(np.allclose(mat1, mat2, atol=1e-7) for mat2 in m2), (
                a, full,
            )


def test_point_group_case_insensitivity():
    """(reference tests/test_point_group.py:185-200)."""
    from helicon_tpu import PointGroup

    for low, high in [
        ("c2", "C2"), ("D4", "d4"), ("t", "T"), ("O", "o"), ("i", "I"),
        ("i_5Z2X", "I_5z2x"), ("i1", "I1"), ("i4", "I4"),
    ]:
        m1 = PointGroup(low).matrices
        m2 = PointGroup(high).matrices
        assert len(m1) == len(m2)
        for mat1 in m1:
            assert any(np.allclose(mat1, mat2, atol=1e-7) for mat2 in m2)


def test_point_group_conversion_rotation_maps_5fold():
    """get_icosahedral_conversion_rotation maps a 5-fold axis of the
    source convention onto a 5-fold axis of the target (reference
    tests/test_point_group.py:143-166)."""
    from helicon_tpu import PointGroup

    rot = PointGroup.get_icosahedral_conversion_rotation("I_5z2x", "I_2z2x5y")
    v5 = rot.apply(np.array([0.0, 0.0, 1.0]))
    found = False
    for r in PointGroup("I_2z2x5y").get_rotations():
        vec = r.as_rotvec()
        ang = np.linalg.norm(vec)
        if np.isclose(ang, 2 * np.pi / 5, atol=1e-5) or np.isclose(
            ang, 4 * np.pi / 5, atol=1e-5
        ):
            ax = vec / ang
            if np.allclose(abs(ax), abs(v5), atol=1e-5):
                found = True
                break
    assert found


def test_shiny_client_url_query_params():
    """(reference tests/test_shiny.py: mock input, both directions)."""
    from unittest.mock import MagicMock

    from helicon_tpu.utils import shiny as hshiny

    mock_input = MagicMock()
    mock_input._map = {
        ".clientdata_url_search": MagicMock(
            return_value="?param1=value1&param2=value2"
        )
    }
    mock_input.__getitem__ = lambda self, k: self._map[k]
    params = hshiny.get_client_url_query_params(mock_input)
    assert params == {"param1": ["value1"], "param2": ["value2"]}
    flat = hshiny.get_client_url_query_params(mock_input, keep_list=False)
    assert flat == {"param1": "value1", "param2": "value2"}

    tag = hshiny.set_client_url_query_params({"param1": "value1", "param2": "value2"})
    assert "param1=value1&param2=value2" in str(tag)


def test_webapp_modules_importable_without_shiny():
    """The compute layers import cleanly without shiny; the app modules
    are gated (reference pattern: shiny is optional)."""
    import importlib

    m1 = importlib.import_module("helicon_tpu.webApps.denovo3D.pipeline")
    m2 = importlib.import_module("helicon_tpu.webApps.whereIsMyClass.compute")
    assert hasattr(m1, "process_one_task")
    assert hasattr(m2, "compute_pair_distances")

    try:
        import shiny  # noqa: F401

        has_shiny = True
    except ImportError:
        has_shiny = False
    if has_shiny:
        importlib.import_module("helicon_tpu.webApps.denovo3D.app")
        importlib.import_module("helicon_tpu.webApps.whereIsMyClass.app")


def test_ptycho_h5_loader_reference_layout(tmp_path):
    """EMPIAR-12236 layout ingest (reference lib/ptycho.py:12-52)."""
    import h5py

    from helicon_tpu.core.ptycho import load_h5_file

    f = tmp_path / "scan.h5"
    rng = np.random.default_rng(0)
    with h5py.File(f, "w") as h:
        d = h.create_dataset("data", data=rng.random((3, 4, 8, 8)))
        d.attrs["Acceleration voltage [kV]"] = 300.0
        d.attrs["Convergence semi-angle [mrad]"] = 5.0
        d.attrs["STEM step-size [A]"] = 20.0
        h.create_dataset("vacuumProbe", data=rng.random((8, 8)))
    data, vacuum, acc_v, semi, r_pix = load_h5_file(str(f))
    assert data.shape == (3, 4, 8, 8) and vacuum.shape == (8, 8)
    assert acc_v == pytest.approx(300e3)
    assert semi == pytest.approx(5.0)
    assert r_pix == pytest.approx(20.0)


def test_ptycho_h5_loader_generic_layout(tmp_path):
    import h5py

    from helicon_tpu.core.ptycho import load_h5_file

    f = tmp_path / "scan.h5"
    rng = np.random.default_rng(0)
    with h5py.File(f, "w") as h:
        g = h.create_group("datacube")
        d = g.create_dataset("cube", data=rng.random((3, 4, 8, 8)))
        d.attrs["energy"] = 200.0
        d.attrs["pixel_size"] = 0.5
    data, vacuum, acc_v, semi, r_pix = load_h5_file(str(f))
    assert data.shape == (3, 4, 8, 8) and vacuum is None
    assert acc_v == pytest.approx(200e3)
    assert r_pix == pytest.approx(0.5)


def test_ptycho_h5_loader_no_4d_raises(tmp_path):
    import h5py

    from helicon_tpu.core.ptycho import load_h5_file

    f = tmp_path / "bad.h5"
    with h5py.File(f, "w") as h:
        h.create_dataset("img", data=np.zeros((4, 4)))
    with pytest.raises(ValueError):
        load_h5_file(str(f))


def _make_ptycho_fixture(path, defocus=-600.0, scan=12, step_px=2, det=32):
    """Synthetic 4D-STEM dataset with a defocused-aperture probe and a
    smooth random phase object; returns (truth potential, gen offset)."""
    import h5py

    from helicon_tpu.core.ptycho import electron_wavelength_angstrom

    rng = np.random.default_rng(0)
    acc_v = 300e3
    lam = electron_wavelength_angstrom(acc_v)
    bf_r = 8.0
    q_pixel_mrad = lam / (det * 1.0) * 1e3  # real-space dx = 1.0 A
    semiconv = bf_r * q_pixel_mrad
    ky = np.fft.fftfreq(det)[:, None] * det
    kx = np.fft.fftfreq(det)[None, :] * det
    rr = np.hypot(ky, kx)
    k_a = rr * (q_pixel_mrad * 1e-3) / lam
    chi = np.pi * lam * k_a**2 * defocus
    probe_f = (rr <= bf_r) * np.exp(1j * chi)
    probe = np.fft.ifft2(probe_f)
    probe /= np.sqrt((np.abs(probe) ** 2).sum())

    from scipy.ndimage import gaussian_filter

    oy = ox = (scan - 1) * step_px + det + 8
    # smooth random phase object; reflect-mode blur keeps boundary
    # structure the parallax shift measurement needs on a tiny scan
    V = gaussian_filter(rng.standard_normal((oy, ox)), 3)
    V = (0.6 * V / np.abs(V).max()).astype(np.float32)
    O = np.exp(1j * V)
    pad_gen = 4
    data = np.zeros((scan, scan, det, det), np.float32)
    for i in range(scan):
        for j in range(scan):
            y0, x0 = i * step_px + pad_gen, j * step_px + pad_gen
            psi = probe * O[y0 : y0 + det, x0 : x0 + det]
            data[i, j] = np.fft.fftshift(np.abs(np.fft.fft2(psi)) ** 2)
    with h5py.File(path, "w") as h:
        d = h.create_dataset("data", data=data)
        d.attrs["Acceleration voltage [kV]"] = acc_v / 1e3
        d.attrs["Convergence semi-angle [mrad]"] = semiconv
        d.attrs["STEM step-size [A]"] = float(step_px)
        h.create_dataset("vacuumProbe", data=np.fft.fftshift(np.abs(probe_f) ** 2))
    return V, pad_gen


@pytest.mark.slow
def test_ptycho_reconstruct_synthetic(tmp_path):
    """Native Parallax + ePIE engine recovers a known phase object from a
    synthetic 4D-STEM scan (replaces the reference's py4DSTEM driver,
    lib/ptycho.py:54-239). Correlation > 0.9 over the scanned region."""
    from helicon_tpu.core.ptycho import reconstruct_ptychography

    f = tmp_path / "scan4d.h5"
    V, pad_gen = _make_ptycho_fixture(f)
    scan, step_px, det = 12, 2, 32
    pot = reconstruct_ptychography(
        str(f), com_rotation_force=0.0, crop_margin=0,
        num_iter=50, step_size=1.0, batch_size=1,
    )
    tru = np.zeros_like(pot)
    oy, ox = V.shape
    tru[16 - pad_gen : 16 - pad_gen + oy, 16 - pad_gen : 16 - pad_gen + ox] = V
    span = (scan - 1) * step_px + det
    m = 10
    r = pot[16 + m : 16 + span - m, 16 + m : 16 + span - m]
    t = tru[16 + m : 16 + span - m, 16 + m : 16 + span - m]
    r = r - r.mean()
    t = t - t.mean()
    cc = float((r * t).sum() / np.sqrt((r * r).sum() * (t * t).sum()))
    assert cc > 0.9, cc


def test_ptycho_parallax_defocus_estimate(tmp_path):
    """The parallax stage recovers the generation defocus sign and
    magnitude (within 40% — the axial BF image of a PURE phase object
    carries almost no first-order contrast, so single-shot correlation
    against it is systematically approximate), scales with the true
    defocus, and — the property that actually broke once — is robust to
    sub-pixel errors in the estimated bright-field center (the trimmed
    intercept fit; a 0.1 px center shift used to flip the fitted sign)."""
    from helicon_tpu.core.ptycho import (
        electron_wavelength_angstrom,
        estimate_defocus_parallax,
        load_h5_file,
    )

    f = tmp_path / "scan4d.h5"
    _make_ptycho_fixture(f, defocus=-600.0)
    data, vacuum, acc_v, semi, r_pix = load_h5_file(str(f))
    data = np.asarray(data)
    lam = electron_wavelength_angstrom(acc_v)
    est = estimate_defocus_parallax(data, lam, semi / 8.0, r_pix, 8.0,
                                    (16.0, 16.0))
    assert est == pytest.approx(-600.0, rel=0.40)
    # center-perturbation robustness: +-0.2 px must not change the story
    for c in [(16.03, 15.91), (16.2, 16.3), (15.8, 16.2)]:
        e2 = estimate_defocus_parallax(data, lam, semi / 8.0, r_pix, 8.0, c)
        assert e2 == pytest.approx(est, rel=0.25), (c, e2, est)
    # scaling: a 2x defocus fixture estimates ~2x the magnitude
    f2 = tmp_path / "scan4d_2.h5"
    _make_ptycho_fixture(f2, defocus=-1200.0)
    data2, *_ = load_h5_file(str(f2))
    e12 = estimate_defocus_parallax(np.asarray(data2), lam, semi / 8.0,
                                    r_pix, 8.0, (16.0, 16.0))
    assert e12 == pytest.approx(2.0 * est, rel=0.30)


def test_ptycho_reconstruct_validates_inputs(tmp_path):
    from helicon_tpu.core.ptycho import reconstruct_ptychography

    with pytest.raises(ValueError):
        reconstruct_ptychography("")
    with pytest.raises(ValueError):
        reconstruct_ptychography(str(tmp_path / "missing.h5"))


def test_align_images_zero_ranges_is_identity():
    """scale_range=0, angle_range=0: the reference runs NO optimization
    and returns the identity pose (scale=1, angle=0, shift=0) — no
    polarity probe, no phase-correlation shift."""
    rng = np.random.default_rng(3)
    img = rng.random((32, 32)).astype(np.float32)
    flipped, scale, angle, shift, score = ht.align_images(
        img, img, scale_range=0, angle_range=0, check_polarity=True
    )
    assert not flipped and scale == 1.0 and angle == 0.0
    assert np.allclose(np.asarray(shift), 0.0)
    assert score > 0.99  # identity self-similarity


def test_align_images_returns_raw_aligned_image():
    """return_aligned_moving_image must give the TRANSFORMED RAW image
    (reference alignment.py:223-230), not the tapered/thresholded work
    image: border pixels survive and negative values are not clipped."""
    from helicon_tpu.helix import simulate_helical_projection

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=40.0, rise=8.0, csym=1, helical_diameter=40.0,
        ball_radius=6.0, polymer=0, planarity=1.0, ny=64, nx=64, apix=2.0,
        rng=0,
    ))).astype(np.float32)
    img = img - img.mean()  # ensure negatives exist
    *_, aligned = ht.align_images(
        img, img, scale_range=0, angle_range=0, check_polarity=False,
        return_aligned_moving_image=True,
    )
    aligned = np.asarray(aligned)
    # raw image: negative values survive (threshold_data would clip)
    assert aligned.min() < 0
    np.testing.assert_allclose(aligned, img, atol=1e-4)


def test_map_coordinates_integer_input_matches_scipy():
    """Integer images must interpolate in float and cast like scipy
    (round-half-away), not truncate the bilinear weights to zero."""
    from scipy.ndimage import map_coordinates as scipy_mc

    from helicon_tpu.core.interp import map_coordinates

    x = np.arange(10, dtype=np.int32)
    coords = [[2.5, 2.4, 2.9, 7.5]]
    ours = np.asarray(map_coordinates(x, coords, order=1))
    ref = scipy_mc(x, coords, order=1)
    np.testing.assert_array_equal(ours, ref)
    assert ours.dtype == np.int32
    neg = np.asarray(map_coordinates(-x, [[2.5]], order=1))
    np.testing.assert_array_equal(neg, scipy_mc(-x, [[2.5]], order=1))


def test_fft_crop_rejects_odd_sizes():
    """Odd output sizes used to silently return the wrong shape (and
    diverge between FFT backends); now they fail fast."""
    img = np.random.default_rng(0).random((64, 64)).astype(np.float32)
    with pytest.raises(AssertionError):
        ht.fft_crop(img, (65, 64))
    out = np.asarray(ht.fft_crop(img, (32, 32)))
    assert out.shape == (32, 32)
