"""Bucketed winner selection must ignore bias-inflated bucket scores.

Bucket-geometry scores are comparable only WITHIN a bucket (a longer
bucket volume has more unknowns and fits better). The single-host
bucketed merge therefore picks the winner only among the cross-bucket
RE-SCORED candidates (grid._reconstruct_grid_bucketed's best_global_idx
tracking); the checkpointed and multi-host drivers must do the same.

The real tiny workloads can't catch a violation — their buckets hold
fewer than 10 candidates, so crossbucket_selection re-scores everything.
Here a mocked solver builds a 2-bucket grid whose big bucket leaves four
candidates UN-selected with inflated bucket scores that beat every
re-scored true score: a plain argmax over the final score vector would
crown one of them.
"""

import numpy as np
import pytest


N_A, N_B = 3, 14  # bucket sizes; B > 10 so crossbucket_selection drops 4
INFLATION = 2.0  # bucket-geometry bias added to bucket-B scores


@pytest.fixture()
def fake_solver(monkeypatch):
    """Patch denovo3d.reconstruct_grid with a score oracle.

    Candidate identity rides in the twist value (twist = index). True
    score = index/100. Bucket-geometry calls (geometry_rise_range is not
    None) inflate bucket-B candidates by +2.0, mimicking the
    longer-volume fit bias the second pass exists to undo.
    """
    import helicon_tpu.denovo3d as dn
    from helicon_tpu.denovo3d.grid import GridResult

    calls = []

    def fake_reconstruct_grid(
        image, apix, twists, rises, geometry_rise_range=None, **kw
    ):
        twists = np.asarray(twists, np.float32)
        rises = np.asarray(rises, np.float32)
        base = twists / 100.0
        if geometry_rise_range is not None:
            base = base + np.where(rises > 5.0, INFLATION, 0.0)
        calls.append(
            dict(idx=twists.astype(int).tolist(),
                 bucket_geom=geometry_rise_range is not None)
        )
        return GridResult(
            twists=twists,
            rises=rises,
            scores=base.astype(np.float32),
            geom=None,
            target_apix2d=4.0,
            target_apix3d=8.0,
        )

    monkeypatch.setattr(dn, "reconstruct_grid", fake_reconstruct_grid)
    return calls


def _grid():
    # twist doubles as candidate id; rises split into 2 buckets at the
    # default ratio 1.6 (2.0 vs 8.0)
    tw = np.arange(N_A + N_B, dtype=np.float32)
    ri = np.asarray([2.0] * N_A + [8.0] * N_B, np.float32)
    return tw, ri


def test_crossbucket_selection_drops_low_rank():
    from helicon_tpu.denovo3d.grid import (
        crossbucket_selection,
        global_rise_buckets,
    )

    tw, ri = _grid()
    buckets = global_rise_buckets(ri, 1.6)
    assert [len(b) for b in buckets] == [N_A, N_B]
    scores = tw / 100.0 + np.where(ri > 5.0, INFLATION, 0.0)
    sel = crossbucket_selection(buckets, scores)
    # all of A (3 < 10 floor), top-10 of B -> B's 4 lowest ids excluded
    assert set(range(N_A)) <= set(sel.tolist())
    assert set(sel.tolist()) & set(range(N_A, N_A + N_B)) == set(
        range(N_A + 4, N_A + N_B)
    )


def test_checkpointed_winner_restricted_to_rescored(fake_solver, tmp_path):
    from helicon_tpu.denovo3d import reconstruct_grid_checkpointed

    tw, ri = _grid()
    res = reconstruct_grid_checkpointed(
        np.zeros((8, 8), np.float32), 2.0, tw, ri,
        checkpoint_path=str(tmp_path / "ck.npz"),
        chunk=4, return_best_volume=False,
    )
    scores = np.asarray(res.scores)
    # the 4 un-selected bucket-B candidates retain inflated bucket
    # scores that dominate the raw vector...
    assert float(np.max(scores[N_A : N_A + 4])) > float(
        np.max(scores[N_A + 4 :])
    )
    assert int(np.argmax(scores)) in range(N_A, N_A + 4)
    # ...but the winner is the best RE-SCORED candidate (highest id)
    assert res.best_index == N_A + N_B - 1


def test_checkpointed_winner_single_bucket_plain_argmax(fake_solver, tmp_path):
    """One bucket -> no re-scoring pass -> plain argmax is correct."""
    from helicon_tpu.denovo3d import reconstruct_grid_checkpointed

    tw = np.arange(6, dtype=np.float32)
    ri = np.full(6, 4.75, np.float32)
    res = reconstruct_grid_checkpointed(
        np.zeros((8, 8), np.float32), 2.0, tw, ri,
        checkpoint_path=str(tmp_path / "ck1.npz"),
        chunk=4, return_best_volume=False,
    )
    assert res.best_index == 5


def test_multihost_single_process_passthrough(fake_solver):
    """Non-distributed multihost delegates to reconstruct_grid (whose
    bucketed driver owns winner selection) — no second selection layer
    to diverge."""
    from helicon_tpu.parallel.multihost import multihost_reconstruct_grid

    tw = np.arange(4, dtype=np.float32)
    ri = np.full(4, 4.75, np.float32)
    res = multihost_reconstruct_grid(
        np.zeros((8, 8), np.float32), 2.0, tw, ri,
        return_best_volume=False,
    )
    assert np.asarray(res.scores).shape == (4,)
