"""Golden tests for helicon_tpu.core.transforms against numpy/scipy oracles."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage

import helicon_tpu as ht


def np_oracle_helical_symmetry(data, apix, twist, rise, csym, fraction, new_size, new_apix):
    """Vectorized numpy oracle for apply_helical_symmetry semantics."""
    nz0, ny0, nx0 = data.shape
    if new_apix is None:
        new_apix = apix
    if tuple(new_size) != data.shape:
        nz1, ny1, nx1 = new_size
        work_shape = (max(nz0, nz1), max(ny0, ny1), max(nx0, nx1))
    else:
        work_shape = data.shape
    nz, ny, nx = work_shape
    acc = np.zeros(work_shape, np.float64)
    w = np.zeros(work_shape, np.float64)

    hsym_max = max(1, int(nz * new_apix / rise))
    profile_z = data.sum(axis=(1, 2))
    thr = 0.01 * profile_z.max()
    nzi = np.where(profile_z > thr)[0]
    z0, z1 = nzi[0], nzi[-1]
    zmid = (z0 + z1) // 2 + (z0 + z1) % 2
    half = int(nz0 * fraction + 0.5) // 2
    z0 = max(z0, zmid - half)
    z1 = min(z1, zmid + half)

    K, J, I = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij")
    for hi in range(-hsym_max, hsym_max + 1):
        k2 = ((K - nz // 2) * new_apix + hi * rise) / apix + nz0 // 2
        zvalid = (k2 >= z0) & (k2 < z1)
        for ci in range(csym):
            rot = np.deg2rad(twist * hi + 360 * ci / csym)
            c, s = np.cos(rot), np.sin(rot)
            j2 = (c * (J - ny // 2) + s * (I - nx / 2)) * new_apix / apix + ny0 // 2
            i2 = (-s * (J - ny // 2) + c * (I - nx / 2)) * new_apix / apix + nx0 // 2
            jf = np.floor(j2).astype(int)
            if_ = np.floor(i2).astype(int)
            kf = np.floor(k2).astype(int)
            valid = zvalid & (jf >= 0) & (jf < ny0 - 1) & (if_ >= 0) & (if_ < nx0 - 1)
            kfc = np.clip(kf, 0, nz0 - 1)
            kcc = np.clip(kf + 1, 0, nz0 - 1)
            jfc = np.clip(jf, 0, ny0 - 1)
            jcc = np.clip(jf + 1, 0, ny0 - 1)
            ifc = np.clip(if_, 0, nx0 - 1)
            icc = np.clip(if_ + 1, 0, nx0 - 1)
            wk, wj, wi = k2 - kf, j2 - jf, i2 - if_
            val = (
                (1 - wk) * (1 - wj) * (1 - wi) * data[kfc, jfc, ifc]
                + (1 - wk) * (1 - wj) * wi * data[kfc, jfc, icc]
                + (1 - wk) * wj * (1 - wi) * data[kfc, jcc, ifc]
                + (1 - wk) * wj * wi * data[kfc, jcc, icc]
                + wk * (1 - wj) * (1 - wi) * data[kcc, jfc, ifc]
                + wk * (1 - wj) * wi * data[kcc, jfc, icc]
                + wk * wj * (1 - wi) * data[kcc, jcc, ifc]
                + wk * wj * wi * data[kcc, jcc, icc]
            )
            acc += np.where(valid, val, 0.0)
            w += valid
    out = np.where(w > 0, acc / np.maximum(w, 1), acc)
    if work_shape != tuple(new_size):
        nz1, ny1, nx1 = new_size
        out = out[
            nz // 2 - nz1 // 2 : nz // 2 + nz1 // 2,
            ny // 2 - ny1 // 2 : ny // 2 + ny1 // 2,
            nx // 2 - nx1 // 2 : nx // 2 + nx1 // 2,
        ]
    return out


class TestApplyHelicalSymmetry:
    def test_matches_numpy_oracle(self, rng):
        data = rng.normal(size=(16, 12, 12)).astype(np.float32) ** 2
        got = np.asarray(
            ht.apply_helical_symmetry(
                data, apix=2.0, twist_degree=29.7, rise_angstrom=6.1, csym=2,
                new_size=(16, 12, 12), new_apix=2.0,
            )
        )
        want = np_oracle_helical_symmetry(
            data, 2.0, 29.7, 6.1, 2, 1.0, (16, 12, 12), 2.0
        )
        assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()

    def test_resize_resample(self, rng):
        data = rng.uniform(size=(12, 10, 10)).astype(np.float32)
        got = np.asarray(
            ht.apply_helical_symmetry(
                data, apix=1.5, twist_degree=-12.0, rise_angstrom=4.75, csym=1,
                new_size=(20, 14, 14), new_apix=1.0,
            )
        )
        want = np_oracle_helical_symmetry(
            data, 1.5, -12.0, 4.75, 1, 1.0, (20, 14, 14), 1.0
        )
        assert got.shape == (20, 14, 14)
        assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()

    def test_symmetrized_map_is_invariant(self, rng):
        """Symmetrizing twice changes little: the output obeys the symmetry."""
        data = np.zeros((24, 16, 16), np.float32)
        data[8:16, 4:12, 4:12] = rng.uniform(size=(8, 8, 8)).astype(np.float32)
        once = np.asarray(
            ht.apply_helical_symmetry(
                data, apix=1.0, twist_degree=25.0, rise_angstrom=3.0,
                new_size=(24, 16, 16),
            )
        )
        twice = np.asarray(
            ht.apply_helical_symmetry(
                once, apix=1.0, twist_degree=25.0, rise_angstrom=3.0,
                new_size=(24, 16, 16),
            )
        )
        core = (slice(6, 18), slice(4, 12), slice(4, 12))
        denom = np.abs(once[core]).max()
        assert np.abs(once[core] - twice[core]).max() / denom < 0.3


class TestGeometric:
    def test_transform_map_matches_scipy(self, rng):
        data = rng.normal(size=(12, 12, 12)).astype(np.float32)
        got = np.asarray(ht.transform_map(data, rot=20, tilt=10, psi=-15, dx=1, dy=-2, dz=0.5))

        from scipy.spatial.transform import Rotation as R

        nz, ny, nx = data.shape
        k = np.arange(nz) - nz // 2
        j = np.arange(ny) - ny // 2
        i = np.arange(nx) - nx // 2
        Z, Y, X = np.meshgrid(k, j, i, indexing="ij")
        XYZ = np.vstack((X.ravel(), Y.ravel(), Z.ravel())).T
        xyz = R.from_euler("ZYZ", (20, 10, -15), degrees=True).apply(XYZ)
        xyz[:, 0] += nx // 2 - 1
        xyz[:, 1] += ny // 2 - (-2)
        xyz[:, 2] += nz // 2 - 0.5
        want = ndimage.map_coordinates(
            data.astype(np.float64), xyz[:, [2, 1, 0]].T, order=3
        ).reshape(data.shape)
        assert np.abs(got - want).max() < 5e-4

    def test_transform_map_identity(self, rng):
        data = rng.normal(size=(8, 8, 8)).astype(np.float32)
        assert np.allclose(np.asarray(ht.transform_map(data)), data)

    def test_rotate_shift_image_matches_scipy(self, rng):
        data = rng.normal(size=(24, 20)).astype(np.float32)
        angle, pre, post = 33.0, (1.5, -2.0), (0.5, 3.0)
        got = np.asarray(
            ht.rotate_shift_image(data, angle=angle, pre_shift=pre, post_shift=post, order=1)
        )
        ny, nx = data.shape
        center = np.array([ny // 2, nx // 2], float)
        ang = np.deg2rad(angle)
        m = np.array([[np.cos(ang), np.sin(ang)], [-np.sin(ang), np.cos(ang)]])
        offset = -m @ np.array(post) + center - m @ center - np.array(pre)
        want = ndimage.affine_transform(
            data.astype(np.float64), matrix=m, offset=offset, order=1, mode="constant"
        )
        assert np.abs(got - want).max() < 1e-4

    def test_rotate_shift_noop(self, rng):
        data = rng.normal(size=(8, 8)).astype(np.float32)
        assert np.allclose(np.asarray(ht.rotate_shift_image(data)), data)

    def test_transform_image_moves_peak(self):
        img = np.zeros((32, 32), np.float32)
        img[16, 20] = 1.0
        # rotate 90 deg about the center: (y-16, x-20=4) -> point moves
        out = np.asarray(ht.transform_image(img, rotation=90.0))
        peak = np.unravel_index(np.argmax(out), out.shape)
        # forward rotation by +90 about center maps (x=20,y=16)->(x=16,y=20)
        assert abs(peak[0] - 20) <= 1 and abs(peak[1] - 16) <= 1

    def test_transform_image_translation(self):
        img = np.zeros((16, 16), np.float32)
        img[8, 8] = 1.0
        out = np.asarray(ht.transform_image(img, post_translation=(2.0, 3.0)))
        peak = np.unravel_index(np.argmax(out), out.shape)
        assert peak == (10, 11)

    def test_get_rotated_clip_horizontal(self):
        img = np.tile(np.arange(20, dtype=np.float32), (10, 1))
        clip = np.asarray(ht.get_rotated_clip(img, y0=5, x0=2, y1=5, x1=12, width=3))
        assert clip.shape == (3, 10)
        assert np.allclose(clip[1, 0], 2.0, atol=1e-4)


class TestCropPad:
    def test_crop_center_2d(self, rng):
        data = rng.normal(size=(10, 12))
        out = ht.crop_center(data, (4, 6))
        assert out.shape == (4, 6)
        assert np.allclose(out, data[3:7, 3:9])

    def test_crop_center_3d_offset(self, rng):
        data = rng.normal(size=(8, 8, 8))
        out = ht.crop_center(data, (4, 4, 4), center_offset=(1, 0, -1))
        assert np.allclose(out, data[3:7, 2:6, 1:5])

    def test_pad_round_trip(self, rng):
        data = rng.normal(size=(6, 7))
        padded = np.asarray(ht.pad_to_size(data, (10, 11)))
        assert padded.shape == (10, 11)
        assert np.allclose(ht.crop_center(padded, (6, 7)), data)

    def test_get_clip_out_of_bounds(self, rng):
        img = rng.normal(size=(8, 8))
        clip = ht.get_clip(img, y0=-2, x0=6, height=4, width=4)
        assert clip.shape == (4, 4)
        assert np.allclose(clip[2:, :2], img[0:2, 6:8])
        assert np.all(clip[:2] == 0)

    def test_get_clip3d(self, rng):
        vol = rng.normal(size=(6, 6, 6))
        clip = ht.get_clip3d(vol, 1, 1, 1, 3, 3, 3)
        assert np.allclose(clip, vol[1:4, 1:4, 1:4])

    def test_flip_hand(self, rng):
        vol = rng.normal(size=(4, 5, 6))
        assert np.allclose(ht.flip_hand(vol, "x"), vol[:, :, ::-1])
        assert np.allclose(ht.flip_hand(vol, "y"), vol[:, ::-1, :])
        assert np.allclose(ht.flip_hand(vol, "z"), vol[::-1, :, :])
        with pytest.raises(ValueError):
            ht.flip_hand(vol, "q")


class TestFourier:
    def test_fft_crop_2d_oracle(self, rng):
        data = rng.normal(size=(16, 20)).astype(np.float32)
        got = np.asarray(ht.fft_crop(data, (8, 10)))
        ny, nx = data.shape
        ony, onx = 8, 10
        fft = np.fft.rfft2(data.astype(np.float64))
        trunc = np.fft.fftshift(
            np.fft.fftshift(fft, axes=0)[ny // 2 - ony // 2 : ny // 2 + ony // 2, : onx // 2 + 1],
            axes=0,
        )
        want = np.fft.irfft2(trunc, s=(ony, onx))
        assert np.abs(got - want).max() < 1e-4

    def test_fft_rescale_identity_is_fft(self, rng):
        """At identity zoom (even sizes) the centered-origin phase and
        the (-1)^idx output phase cancel: fft_rescale == plain fft2, and
        ifft2 recovers the image in place (finufft convention,
        reference transforms.py:702-743)."""
        data = rng.normal(size=(12, 16)).astype(np.float32)
        got = np.asarray(ht.fft_rescale(data, apix=1.0))
        want = np.fft.fft2(data)
        assert np.abs(got - want).max() < 1e-3
        rec = np.fft.ifft2(got).real
        assert np.abs(rec - data).max() < 1e-4

    def test_fft_rescale_direct_dft(self, rng):
        data = rng.normal(size=(8, 10)).astype(np.float32)
        apix, cutoff = 1.2, (3.1, 2.9)
        out_size = (12, 14)
        got = np.asarray(
            ht.fft_rescale(data, apix=apix, cutoff_res=cutoff, output_size=out_size)
        )
        fy = np.fft.fftfreq(out_size[0]) * 2 * apix / cutoff[0]
        fx = np.fft.fftfreq(out_size[1]) * 2 * apix / cutoff[1]
        ny, nx = data.shape
        want = np.zeros(out_size, complex)
        # centered real-space indices (finufft type-2 convention)
        jy = np.arange(ny)[:, None] - ny / 2
        jx = np.arange(nx)[None, :] - nx / 2
        for a in range(out_size[0]):
            for b in range(out_size[1]):
                ph = np.exp(-2j * np.pi * (fy[a] * jy + fx[b] * jx))
                want[a, b] = (data * ph).sum()
        idx = np.indices(out_size).sum(axis=0) % 2
        want *= np.where(idx, -1, 1)
        assert np.abs(got - want).max() < 1e-3

    def test_power_spectra_shapes(self, rng):
        data = rng.normal(size=(32, 32)).astype(np.float32)
        pwr, phase = ht.compute_power_spectra(data, apix=1.0, output_size=(32, 32))
        pwr, phase = np.asarray(pwr), np.asarray(phase)
        assert pwr.shape == (32, 32) and phase.shape == (32, 32)
        assert pwr.min() >= 0 and pwr.max() <= 1.0 + 1e-6

    def test_phase_difference_range(self, rng):
        phase = rng.uniform(-np.pi, np.pi, size=(16, 17))
        diff = np.asarray(ht.compute_phase_difference_across_meridian(phase))
        assert diff.min() >= 0 and diff.max() <= 180
        assert np.allclose(diff[:, 0], 0)

    def test_phase_difference_friedel_symmetric(self):
        """An even (real, centrosymmetric) image has 0 phase difference."""
        n = 16
        img = np.zeros((n, n), np.float32)
        img[6:11, 6:11] = 1.0
        img = img + img[::-1, ::-1]  # enforce centrosymmetry about origin... approx
        pwr, phase = ht.compute_power_spectra(np.asarray(img), apix=1.0)
        diff = np.asarray(ht.compute_phase_difference_across_meridian(np.asarray(phase)))
        assert diff.shape == (n, n)


def test_map_coordinates_order0_scipy_half_pixel_convention():
    """scipy's nearest uses floor(x + 0.5); round-half-even picked the
    wrong pixel at exact .5 coordinates (common on even-sized grids)."""
    from scipy import ndimage

    from helicon_tpu.core.interp import map_coordinates

    x = np.arange(8.0, dtype=np.float32)
    c = np.array([[0.5, 1.5, 2.5, 3.5, 6.5]])
    np.testing.assert_allclose(
        np.asarray(map_coordinates(x, c, order=0)),
        ndimage.map_coordinates(x, c, order=0),
    )


def test_map_coordinates_traced_cval_and_vmap():
    """cval is a DYNAMIC jit argument: traced fill values (jit over
    cval, vmap over per-sample cval) must work — the jitted wrapper
    must not coerce it with float()."""
    import jax

    from helicon_tpu.core.interp import map_coordinates

    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    coords = (np.array([-1.0, 1.0]), np.array([0.0, 2.0]))

    f = jax.jit(
        lambda im, cv: map_coordinates(im, coords, order=1, cval=cv)
    )
    out = np.asarray(f(img, 7.0))
    assert out[0] == 7.0 and out[1] == img[1, 2]

    vf = jax.vmap(lambda cv: map_coordinates(img, coords, order=1, cval=cv))
    outs = np.asarray(vf(jnp.asarray([3.0, 9.0])))
    np.testing.assert_array_equal(outs[:, 0], [3.0, 9.0])
