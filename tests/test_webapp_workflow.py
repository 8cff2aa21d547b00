"""denovo3D app workflow logic (shiny-free module): stitching, transform
chain, auto-transform, incremental/abortable grid execution.

Reference: webApps/denovo3D/app.py 77-125 (stitching), 1994-2250
(transform chain + auto-transform), 2455-2523 (incremental display +
abort)."""

import jax
import numpy as np
import pytest

from helicon_tpu.webApps.denovo3D import workflow
from helicon_tpu.webApps.denovo3D.workflow import (
    DEFAULT_URL_KEY,
    URLS,
    apply_transform_chain,
    auto_transform_params,
    combine_images_for_display,
    estimate_threshold_otsu,
    image_stitching_x_positions,
    run_grid_incremental,
)


@pytest.fixture(scope="module")
def helix_image():
    from helicon_tpu.helix import simulate_helical_projection

    imgs = simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=48, apix=2.0,
        rng=0,
    )
    return np.squeeze(np.asarray(imgs)).astype(np.float32)


def test_default_url_is_empiar_10940():
    assert "10940" in URLS[DEFAULT_URL_KEY][0]
    assert "14046" in URLS[DEFAULT_URL_KEY][1]


class TestStitching:
    def test_positions_sequential(self):
        imgs = [np.zeros((4, 10)), np.zeros((4, 6)), np.zeros((4, 8))]
        assert image_stitching_x_positions(imgs) == [0, 10, 16]

    def test_positions_with_offsets(self):
        imgs = [np.zeros((4, 10)), np.zeros((4, 6))]
        assert image_stitching_x_positions(imgs, [0, -4]) == [0, 6]

    def test_combine_no_overlap(self):
        a = np.full((4, 5), 1.0)
        b = np.full((4, 5), 3.0)
        canvas = combine_images_for_display([a, b])
        assert canvas.shape == (4, 10)
        np.testing.assert_allclose(canvas[:, :5], 1.0)
        np.testing.assert_allclose(canvas[:, 5:], 3.0)

    def test_combine_overlap_averages(self):
        a = np.full((4, 6), 1.0)
        b = np.full((4, 6), 3.0)
        canvas = combine_images_for_display([a, b], x_offsets=[0, -2])
        # columns 4-5 are covered by both images -> mean
        np.testing.assert_allclose(canvas[:, 4:6], 2.0)
        np.testing.assert_allclose(canvas[:, :4], 1.0)
        np.testing.assert_allclose(canvas[:, 6:], 3.0)

    def test_combine_empty(self):
        assert combine_images_for_display([]).shape == (0, 0)


class TestTransformChain:
    def test_identity(self, helix_image):
        (out,) = apply_transform_chain([helix_image])
        np.testing.assert_allclose(out, helix_image)

    def test_negate_threshold(self):
        img = np.array([[-2.0, -1.0], [1.0, 2.0]], np.float32)
        (out,) = apply_transform_chain([img], negate=True, threshold=0.5)
        # negate then clip below threshold at 0 (threshold_data semantics)
        assert out[0, 0] > 0 and out[1, 1] == 0

    def test_transpose_flip(self, helix_image):
        (out,) = apply_transform_chain([helix_image], transpose=True)
        assert out.shape == helix_image.shape[::-1]
        (out2,) = apply_transform_chain([helix_image], flip=True)
        np.testing.assert_allclose(out2, np.fliplr(helix_image), atol=1e-6)

    def test_crop_even_center(self, helix_image):
        (out,) = apply_transform_chain(
            [helix_image], vertical_crop_size=16, horizontal_crop_size=32
        )
        assert out.shape == (16, 32)

    def test_rotation_preserves_shape(self, helix_image):
        (out,) = apply_transform_chain([helix_image], rotation=10.0)
        assert out.shape == helix_image.shape
        assert np.isfinite(out).all()


def test_estimate_threshold_otsu_bimodal():
    rng = np.random.default_rng(0)
    img = np.concatenate(
        [rng.normal(0, 0.1, 500), rng.normal(10, 0.1, 500)]
    ).reshape(20, 50)
    t = estimate_threshold_otsu([img])
    # the between-class variance is flat across the bimodal gap; like
    # skimage, the first maximal bin (just past mode 1) is returned —
    # any value separating the modes is correct
    assert 0.25 < t < 9.7


def test_auto_transform_params():
    # a straight horizontal rod rotated off-axis: the auto transform must
    # recover the leveling rotation and an even crop window
    from helicon_tpu.core.transforms import rotate_shift_image

    ys = np.arange(48)[:, None]
    rod = np.exp(-((ys - 24.0) ** 2) / 8.0) * np.ones((48, 64), np.float32)
    rot_img = np.asarray(rotate_shift_image(rod, angle=10.0))
    rotation, shift_y, vc, hc = auto_transform_params([rot_img], apix=2.0)
    assert abs(abs(rotation) - 10.0) < 2.0
    assert vc % 2 == 0 and hc % 2 == 0 and vc >= 32


class TestIncrementalGrid:
    def test_progress_snapshots_and_result(self, helix_image):
        snaps = []
        res = run_grid_incremental(
            helix_image, 2.0,
            np.array([25.0, 30.0, 35.0], np.float32),
            np.array([6.0, 6.0, 6.0], np.float32),
            on_progress=snaps.append,
            cg_iters=8, fista_iters=6, batch_size=1,
            devices=jax.devices()[:1],
            return_best_volume=False, horizontalize=0,
        )
        assert len(snaps) >= 3
        final = snaps[-1]
        assert final.done == final.total == 3 and not final.aborted
        # ranked best-first, matches the GridResult ordering
        scores = [s for _, _, s in final.ranked]
        assert scores == sorted(scores, reverse=True)
        assert final.ranked[0][0] == pytest.approx(
            float(res.twists[res.best_index])
        )
        # mid-run snapshot carries a finite ETA
        assert snaps[0].eta_seconds >= 0

    def test_abort_keeps_completed_scores(self, helix_image):
        calls = dict(n=0)

        def should_abort():
            calls["n"] += 1
            return calls["n"] > 1  # allow the first batch only

        res = run_grid_incremental(
            helix_image, 2.0,
            np.array([25.0, 30.0, 35.0], np.float32),
            np.array([6.0, 6.0, 6.0], np.float32),
            should_abort=should_abort,
            cg_iters=8, fista_iters=6, batch_size=1,
            devices=jax.devices()[:1],
            return_best_volume=False, horizontalize=0,
        )
        s = np.asarray(res.scores)
        assert s[0] > 0  # first batch completed
        assert np.isneginf(s[2:]).all()  # aborted: -inf = unscored


def test_final_snapshot_after_abort_ranks_only_scored():
    """An aborted grid leaves unscored candidates at 0.0: the final
    GridProgress must not rank them (nor report done=total)."""
    import jax
    import numpy as np

    from helicon_tpu.helix import simulate_helical_projection
    from helicon_tpu.webApps.denovo3D.workflow import run_grid_incremental

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=48, apix=2.0,
        rng=0,
    ))).astype(np.float32)
    twists = np.full(4, 30.0, np.float32)
    rises = np.full(4, 6.0, np.float32)
    snaps = []
    calls = {"n": 0}

    def abort():
        calls["n"] += 1
        return calls["n"] > 1  # abort after the first batch

    run_grid_incremental(
        img, 2.0, twists, rises, on_progress=snaps.append,
        should_abort=abort, cg_iters=5, fista_iters=4, batch_size=2,
        devices=jax.devices()[:1],  # keep batch_size=2 (it rounds up to n_dev)
        return_best_volume=False, horizontalize=0,
    )
    final = snaps[-1]
    assert final.aborted
    assert final.done < final.total
    assert all(np.isfinite(s) for _, _, s in final.ranked)


class TestKnobSurface:
    """Round-4 knob additions (VERDICT r3 #4): reference sidebar controls
    reach the pure workflow layer."""

    def test_filter_blank_images(self):
        stack = np.stack([
            np.zeros((8, 8), np.float32),
            np.linspace(0, 1, 64).reshape(8, 8).astype(np.float32),
            np.full((8, 8), 2.5, np.float32),  # constant = blank
        ])
        assert workflow.filter_blank_images(stack) == [1]

    def test_preprocess_binning_scales_apix(self):
        img = np.random.default_rng(0).random((32, 64)).astype(np.float32)
        out, apix = workflow.preprocess_selected_images([img], 2.0, binning=2)
        assert out[0].shape == (16, 32)
        assert apix == 4.0
        # block mean: first output pixel is the 2x2 mean
        np.testing.assert_allclose(out[0][0, 0], img[:2, :2].mean(), rtol=1e-6)

    def test_preprocess_band_pass(self):
        rng = np.random.default_rng(1)
        img = rng.random((64, 64)).astype(np.float32)
        lp, apix = workflow.preprocess_selected_images([img], 2.0, lp_angst=20)
        assert apix == 2.0
        # low-pass removes power: variance strictly drops
        assert np.var(lp[0]) < np.var(img)
        hp, _ = workflow.preprocess_selected_images([img], 2.0, hp_angst=200)
        # high-pass kills the mean
        assert abs(np.mean(hp[0])) < abs(np.mean(img))

    def test_estimate_stitch_offsets_recovers_overlap(self):
        base = np.random.default_rng(2).random((16, 90))
        imgs = [base[:, :50], base[:, 30:70], base[:, 55:]]
        offs = workflow.estimate_stitch_offsets(imgs)
        assert offs == [0.0, -20.0, -35.0]  # cumulative overlaps
        # montage built from those offsets reproduces the base profile
        mont = workflow.combine_images_for_display(imgs, offs)
        assert mont.shape == (16, 90)
        np.testing.assert_allclose(mont, base, atol=1e-9)

    def test_symmetrize_projection_simulation_mode(self):
        vol = np.zeros((24, 20, 20), np.float32)
        vol[8:14, 10, 14] = 50.0
        proj, apix = workflow.symmetrize_projection(
            vol, apix=2.0, twist_degree=29.4, rise_angstrom=4.75, csym=1,
            new_size=(24, 20, 20), new_apix=2.5, axial_rotation=5.0,
            tilt=2.0, gauss_noise_std=0.0,
        )
        assert proj.shape == (1, 20, 24) and apix == 2.5
        assert float(np.abs(proj).max()) > 0
        # noise: same params with gauss_noise_std>0 differ, deterministic rng
        noisy, _ = workflow.symmetrize_projection(
            vol, apix=2.0, twist_degree=29.4, rise_angstrom=4.75, csym=1,
            new_size=(24, 20, 20), new_apix=2.5, gauss_noise_std=0.5, rng=0,
        )
        clean, _ = workflow.symmetrize_projection(
            vol, apix=2.0, twist_degree=29.4, rise_angstrom=4.75, csym=1,
            new_size=(24, 20, 20), new_apix=2.5,
        )
        assert not np.allclose(noisy, clean)

    def test_score_plot_data_2d_max_aggregated(self):
        tw = np.repeat([1.0, 2.0, 3.0], 2)
        ri = np.tile([4.0, 5.0], 3)
        sc = np.asarray([0.1, 0.2, 0.9, 0.4, 0.5, 0.6])
        d = workflow.score_plot_data(tw, ri, sc)
        assert d["kind"] == "2d" and d["z"].shape == (3, 2)
        assert d["best"] == (2.0, 4.0)
        # duplicate candidates max-aggregate
        d2 = workflow.score_plot_data(
            np.r_[tw, 2.0], np.r_[ri, 4.0], np.r_[sc, 0.95]
        )
        assert d2["z"][1, 0] == 0.95

    def test_score_plot_data_1d_and_degenerate(self):
        d = workflow.score_plot_data(
            np.asarray([3.0, 1.0, 2.0]), np.full(3, 4.75),
            np.asarray([0.3, 0.1, 0.2]),
        )
        assert d["kind"] == "1d" and d["xlabel"].startswith("Twist")
        assert list(d["x"]) == [1.0, 2.0, 3.0]
        assert workflow.score_plot_data([1.0], [2.0], [0.5]) is None

    def test_grid_kwargs_reach_reconstruct(self, helix_image):
        """positive_constraint / target_apix / reconstruct_length_rise /
        l1_ratio thread through run_grid_incremental to the grid."""
        res = workflow.run_grid_incremental(
            helix_image, 2.0,
            np.asarray([29.4], np.float32), np.asarray([4.75], np.float32),
            target_apix2d=4.0, target_apix3d=4.0,
            reconstruct_length_rise=2.0, positive_constraint=1,
            algorithm=dict(model="elasticnet", alpha=1e-5, l1_ratio=0.3),
            cg_iters=4, fista_iters=4, power_iters=2,
            compute_dtype="float32", return_best_volume=False,
        )
        assert np.isfinite(res.scores).all()

    def test_register_and_montage_recovers_2d_layout(self):
        """Native ITK-TileMontage equivalent (reference
        pipeline.py:500-599): 2D phase-correlation registration recovers
        both the x overlap and a vertical misalignment, and the merged
        canvas reproduces the source."""
        base = np.random.default_rng(5).random((40, 120)).astype(np.float32)
        t1 = base[2:34, :70]
        t2 = base[5:37, 50:]  # 20-px x overlap, 3-px y shift
        mont, pos = workflow.register_and_montage([t1, t2])
        assert pos == [(0, 0), (3, 50)]
        assert mont.shape == (35, 120)
        # overlap-averaged canvas equals the source where only one tile
        # contributes (and the average where both do, same source data)
        np.testing.assert_allclose(mont[:32, :50], t1[:, :50], atol=1e-6)
        np.testing.assert_allclose(mont[3:35, 70:], t2[:, 20:], atol=1e-6)
