"""densify_padding (VERDICT r4 #3): the grouped scorer's repeat-padding
slots become REAL interpolated rises whose scores return in
GridResult.extras — the requested candidates' scores, ranking, and
winner must be untouched, and each extra's score must equal a direct
re-score of that (twist, rise).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def image():
    from helicon_tpu.helix import simulate_helical_projection

    return np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=6.0, polymer=0, planarity=1.0,
        ny=64, nx=128, apix=2.0, rng=0,
    )))


KW = dict(
    apix=2.0, target_apix2d=4.0, tube_diameter=110.0,
    cg_iters=8, fista_iters=10, power_iters=2, compute_dtype="float32",
    batch_size=16, return_best_volume=False,
)


def _grid13():
    # 13 rises/twist: the bench's padded regime once R_pad = 16
    rises_1 = np.linspace(4.45, 5.05, 13).astype(np.float32)
    tw = np.repeat(np.asarray([28.0, 29.4, 31.0], np.float32), 13)
    return tw, np.tile(rises_1, 3)


def test_densify_fills_padding_with_real_candidates(image, monkeypatch):
    from helicon_tpu.denovo3d.grid import reconstruct_grid

    monkeypatch.setenv("HELICON_GRID_GROUP_R", "16")
    tw, ri = _grid13()
    base = reconstruct_grid(image, twists=tw, rises=ri, **KW)
    dens = reconstruct_grid(
        image, twists=tw, rises=ri, densify_padding=True, **KW
    )
    assert dens.effective["R_pad"] == 16
    assert dens.effective["densified"] == 9  # 3 padded slots x 3 groups
    # requested candidates: bit-for-bit the same run
    np.testing.assert_allclose(dens.scores, base.scores, atol=2e-5)
    assert dens.best_index == base.best_index
    ex = dens.extras
    assert ex is not None and len(ex["scores"]) == 9
    assert np.all(np.isfinite(ex["scores"]))
    # extras stay inside the grid's rise envelope (same geometry)
    assert ex["rises"].min() >= ri.min() - 1e-4
    assert ex["rises"].max() <= ri.max() + 1e-4

    # an extra's score equals a direct re-score of that (twist, rise)
    t0, r0 = float(ex["twists"][0]), float(ex["rises"][0])
    chk = reconstruct_grid(
        image,
        twists=np.asarray([t0] * 3, np.float32),
        rises=np.asarray([r0, r0 + 0.15, r0 - 0.15], np.float32),
        **KW,
    )
    assert abs(float(chk.scores[0]) - float(ex["scores"][0])) < 5e-3


def test_densify_noop_without_padding(image, monkeypatch):
    """Groups that already fill R_pad have no slots to densify."""
    from helicon_tpu.denovo3d.grid import reconstruct_grid

    monkeypatch.setenv("HELICON_GRID_GROUP_R", "13")
    tw, ri = _grid13()
    dens = reconstruct_grid(
        image, twists=tw, rises=ri, densify_padding=True, **KW
    )
    assert dens.effective["densified"] == 0
    assert dens.extras is None


def test_densify_single_rise_groups_keep_repeat_padding(image, monkeypatch):
    """A twist whose rises are all identical has no gap to subdivide:
    its padded slots keep the repeat padding (no bogus extras)."""
    from helicon_tpu.denovo3d.grid import reconstruct_grid

    monkeypatch.setenv("HELICON_GRID_GROUP_R", "8")
    tw = np.asarray([28.0] * 3 + [31.0] * 3, np.float32)
    ri = np.asarray([4.75] * 3 + [4.6, 4.75, 4.9], np.float32)
    dens = reconstruct_grid(
        image, twists=tw, rises=ri, densify_padding=True, **KW
    )
    ex = dens.extras
    # only the 31.0 group (3 distinct rises) densifies its 5 slots
    assert dens.effective["densified"] == 5
    assert np.allclose(ex["twists"], 31.0)


def test_densify_extras_survive_bucketing(image, monkeypatch):
    """densify_padding must flow through the bucketed driver: extras
    from every bucket's sub-run are merged into the final result (the
    re-scoring second pass and winner re-solve mint none)."""
    from helicon_tpu.denovo3d.grid import reconstruct_grid

    monkeypatch.setenv("HELICON_GRID_GROUP_R", "8")
    # wide rise range -> 2 buckets; per-bucket groups of < 8 rises
    tw = np.asarray([28.0] * 3 + [28.0] * 3, np.float32)
    ri = np.asarray([2.0, 2.4, 2.8, 6.0, 6.8, 7.6], np.float32)
    dens = reconstruct_grid(
        image, twists=tw, rises=ri, densify_padding=True, **KW
    )
    ex = dens.extras
    assert ex is not None and len(ex["scores"]) > 0
    assert np.all(np.isfinite(ex["scores"]))
    # every extra's rise lies inside ONE bucket's envelope
    assert (
        ((ex["rises"] >= 2.0 - 1e-4) & (ex["rises"] <= 2.8 + 1e-4))
        | ((ex["rises"] >= 6.0 - 1e-4) & (ex["rises"] <= 7.6 + 1e-4))
    ).all()


def test_densify_extras_persist_across_checkpoint_resume(
    image, monkeypatch, tmp_path
):
    """Checkpointed densified searches must not lose extras from chunks
    completed before a kill: extras are persisted in the shard and a
    kill+resume run ends with the same extras as an uninterrupted
    checkpointed run (same chunk layout)."""
    from helicon_tpu.denovo3d import reconstruct_grid_checkpointed

    monkeypatch.setenv("HELICON_GRID_GROUP_R", "16")
    tw, ri = _grid13()
    kw = dict(KW, densify_padding=True)

    ref = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri,
        checkpoint_path=str(tmp_path / "a.ckpt.npz"), chunk=13, **kw
    )
    assert ref.extras is not None and len(ref.extras["scores"]) == 9

    # interrupted run: abort after the first chunk, then resume
    calls = {"n": 0}

    def abort_after_one():
        calls["n"] += 1
        return calls["n"] > 1

    ck = str(tmp_path / "b.ckpt.npz")
    partial = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=ck, chunk=13,
        should_abort=abort_after_one, **kw
    )
    assert partial.effective["aborted"]
    n_partial = (
        0 if partial.extras is None else len(partial.extras["scores"])
    )
    assert 0 < n_partial < 9  # first chunk's extras only
    got = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=ck, chunk=13, **kw
    )
    assert got.extras is not None
    assert len(got.extras["scores"]) == len(ref.extras["scores"])
    # same extras content (order may differ across chunk scheduling)
    ref_set = sorted(zip(ref.extras["twists"], ref.extras["rises"]))
    got_set = sorted(zip(got.extras["twists"], got.extras["rises"]))
    np.testing.assert_allclose(got_set, ref_set, atol=1e-5)
