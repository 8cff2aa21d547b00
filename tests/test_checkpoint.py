"""Checkpoint/resume for grid searches (denovo3d/checkpoint.py).

The resumable driver must (a) reproduce the one-shot reconstruct_grid
result exactly, (b) survive an interruption with a valid partial state,
(c) resume by recomputing ONLY the missing candidates, and (d) refuse a
checkpoint written for a different grid.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy solver coverage


@pytest.fixture(scope="module")
def workload():
    from tests._mh_worker import tiny_workload

    return tiny_workload()


@pytest.fixture(scope="module")
def workload_bucketed():
    from tests._mh_worker import tiny_workload

    return tiny_workload(bucketed=True)


def test_checkpointed_matches_oneshot(workload, tmp_path_factory):
    from helicon_tpu.denovo3d import (
        reconstruct_grid,
        reconstruct_grid_checkpointed,
    )

    image, tw, ri, kw = workload
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    ck = tmp_path_factory.mktemp("ck") / "run.ckpt.npz"
    got = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=3, **kw
    )
    np.testing.assert_allclose(got.scores, ref.scores, rtol=0, atol=2e-5)
    assert got.best_index == int(np.argmax(ref.scores))
    assert ck.exists()
    assert got.effective["checkpointed"]
    assert got.effective["chunks_run"] == -(-len(tw) // 3)


def test_checkpointed_bucketed_matches_oneshot(workload_bucketed, tmp_path_factory):
    from helicon_tpu.denovo3d import (
        reconstruct_grid,
        reconstruct_grid_checkpointed,
    )

    image, tw, ri, kw = workload_bucketed
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    ck = tmp_path_factory.mktemp("ckb") / "run.ckpt.npz"
    got = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=2, **kw
    )
    np.testing.assert_allclose(got.scores, ref.scores, rtol=0, atol=2e-5)
    assert got.best_index == int(np.argmax(ref.scores))
    assert got.effective["n_buckets"] == 2


def test_abort_then_resume(workload, tmp_path_factory):
    from helicon_tpu.denovo3d import (
        reconstruct_grid,
        reconstruct_grid_checkpointed,
    )

    image, tw, ri, kw = workload
    ck = tmp_path_factory.mktemp("ckr") / "run.ckpt.npz"

    calls = {"n": 0}

    def abort_after_two():
        calls["n"] += 1
        return calls["n"] > 2  # allow 2 chunks, then stop

    partial = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=2,
        should_abort=abort_after_two, **kw
    )
    assert partial.effective["aborted"]
    assert partial.effective["chunks_run"] == 2
    # the returned result follows reconstruct_grid's incremental-mode
    # convention: unscored candidates are -inf (NaN only lives on disk)
    assert not np.isnan(np.asarray(partial.scores)).any()
    done = np.isfinite(np.asarray(partial.scores))
    assert 0 < done.sum() < len(tw)
    assert partial.best_volume is None
    # the persisted state marks the same candidates as missing (as NaN)
    z = np.load(ck)
    np.testing.assert_array_equal(
        np.isnan(z["scores"]), np.isneginf(np.asarray(partial.scores))
    )

    # resume: only the missing candidates are recomputed
    got = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=2, **kw
    )
    assert got.effective["chunks_run"] == -(-int((~done).sum()) // 2)
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    np.testing.assert_allclose(got.scores, ref.scores, rtol=0, atol=2e-5)
    assert got.best_index == int(np.argmax(ref.scores))

    # a third run finds nothing to do
    again = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=2, **kw
    )
    assert again.effective["chunks_run"] == 0
    np.testing.assert_allclose(again.scores, ref.scores, rtol=0, atol=2e-5)


def test_checkpoint_grid_mismatch_raises(workload, tmp_path_factory):
    from helicon_tpu.denovo3d import reconstruct_grid_checkpointed
    from helicon_tpu.utils.exceptions import HeliconError

    image, tw, ri, kw = workload
    ck = tmp_path_factory.mktemp("ckm") / "run.ckpt.npz"
    reconstruct_grid_checkpointed(
        image, twists=tw[:4], rises=ri[:4], checkpoint_path=str(ck),
        chunk=2, **dict(kw, return_best_volume=False)
    )
    with pytest.raises(HeliconError, match="different candidate grid"):
        reconstruct_grid_checkpointed(
            image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=2,
            **dict(kw, return_best_volume=False)
        )


def test_checkpointed_refine_topk(workload, tmp_path_factory):
    """Deferred top-k refinement matches the one-shot refined result."""
    from helicon_tpu.denovo3d import (
        reconstruct_grid,
        reconstruct_grid_checkpointed,
    )

    image, tw, ri, kw = workload
    rkw = dict(
        kw,
        refine_tilt_psi_dy_range=dict(tilt=4.0, psi=2.0, dy=1.0, max_iter=2),
        refine_top_k=2,
    )
    ref = reconstruct_grid(image, twists=tw, rises=ri, **rkw)
    ck = tmp_path_factory.mktemp("ckt") / "run.ckpt.npz"
    got = reconstruct_grid_checkpointed(
        image, twists=tw, rises=ri, checkpoint_path=str(ck), chunk=3, **rkw
    )
    np.testing.assert_allclose(got.scores, ref.scores, rtol=0, atol=2e-5)
    assert got.best_index == int(np.argmax(ref.scores))
    assert got.refined_params is not None and ref.refined_params is not None
    assert set(got.refined_params) == set(ref.refined_params)
    for k in ref.refined_params:
        np.testing.assert_allclose(
            got.refined_params[k], ref.refined_params[k], atol=1e-4
        )
