"""Reduced convergence A/B vs the ACTUAL reference framework (tools/
ab_convergence.py run small): identical initial weights + identical batch
schedule must give matching loss trajectories AND matching held-out
accuracy after a few hundred training steps.

The full version (3000 steps, hs=16) is recorded in docs/ab_convergence.json
and ACCURACY.md; this keeps the pipeline honest in ~2 minutes.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("tensorflow")

from tools.ab_convergence import run_ab


@pytest.fixture(scope="module")
def ab_result(tmp_path_factory):
    return run_ab(
        steps=350,
        hs=8,
        iters=3,
        batch=4,
        n_train=100,
        n_eval=40,
        n_links=12,
        n_paths=14,
        max_path_len=4,
        timing_steps=5,
        loss_every=10,
        dataset_root=str(tmp_path_factory.mktemp("ab_ds")),
        progress=lambda *a: None,
    )


def test_loss_trajectories_track(ab_result):
    ref = np.asarray(ab_result["reference"]["loss_curve"])
    got = np.asarray(ab_result["repo"]["loss_curve"])
    # identical init + identical batches: the first losses are the forward
    # parity check, the rest bound accumulated trajectory drift
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-4)
    np.testing.assert_allclose(got, ref, rtol=0.05)


def test_final_accuracy_matches(ab_result):
    """At a few hundred steps R² is still moving fast, so float
    nondeterminism (TF threading) compounds into a few-hundredths R²
    spread between runs — the bound is sized for that (the 3000-step run
    in docs/ab_convergence.json matches to 4 decimals); the smoother
    training-loss average gets the tighter bound."""
    r_ref = ab_result["reference"]["metrics"]
    r_got = ab_result["repo"]["metrics"]
    l_ref = ab_result["reference"]["final_loss_mean_last50"]
    l_got = ab_result["repo"]["final_loss_mean_last50"]
    assert abs(l_got - l_ref) < 0.15 * max(abs(l_ref), 1e-9), (l_got, l_ref)
    if r_ref["r2"] <= 0.5:
        # LOUD skip, not a silent pass: TF threading makes ~1-in-N runs
        # plateau at a few hundred steps; the trajectory test above still
        # binds those runs step for step, and a PERSISTENT reference
        # regression shows up as accumulating skips in the report
        pytest.skip(
            f"reference run plateaued this time (R²={r_ref['r2']:.3f}); "
            "trajectory + loss bounds still asserted"
        )
    assert abs(r_got["r2"] - r_ref["r2"]) < 0.06, (r_got, r_ref)


def test_repo_step_not_slower(ab_result):
    """The honest framework-overhead number: this repo's compiled CPU step
    must not be slower than the reference's compiled CPU step (in practice
    it is ~10x faster; assert a loose bound so noise can't flake)."""
    assert ab_result["repo"]["ms_per_step"] < ab_result["reference"]["ms_per_step"]


@pytest.fixture(scope="module")
def ab_flagship_result(tmp_path_factory):
    """FLAGSHIP configuration (hs=32, 8 iterations, repo on the bf16
    mixed-precision path) — the benchmark model's config, reduced in steps/
    graph size. The full 600-step run is docs/ab_convergence_flagship.json
    (R^2 0.9454 ref vs 0.9439 repo-bf16)."""
    return run_ab(
        steps=150,
        hs=32,
        iters=8,
        batch=4,
        n_train=100,
        n_eval=40,
        n_links=16,
        n_paths=20,
        max_path_len=5,
        timing_steps=5,
        loss_every=10,
        bf16=True,
        dataset_root=str(tmp_path_factory.mktemp("ab_ds_flag")),
        progress=lambda *a: None,
    )


def test_flagship_config_trajectory_tracks(ab_flagship_result):
    """bf16 deep-unroll trajectory vs the f32 reference: the first loss is
    the forward-parity check (bf16 rounding only), the rest bounds the
    accumulated drift of the mixed-precision path at flagship depth."""
    ref = np.asarray(ab_flagship_result["reference"]["loss_curve"])
    got = np.asarray(ab_flagship_result["repo"]["loss_curve"])
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-2)
    np.testing.assert_allclose(got, ref, rtol=0.08)


def test_flagship_config_accuracy_matches(ab_flagship_result):
    """150 steps is mid-convergence for the deep model (R² ~0.3-0.5 and
    climbing fast), so the R² spread bound is wider than the converged
    600-step run's (which matches to 0.002, ACCURACY.md); the smoother
    training-loss average carries the tight bound."""
    r_ref = ab_flagship_result["reference"]["metrics"]
    r_got = ab_flagship_result["repo"]["metrics"]
    assert abs(r_got["r2"] - r_ref["r2"]) < 0.15, (r_got, r_ref)
    l_ref = ab_flagship_result["reference"]["final_loss_mean_last50"]
    l_got = ab_flagship_result["repo"]["final_loss_mean_last50"]
    assert abs(l_got - l_ref) < 0.15 * max(abs(l_ref), 1e-9), (l_got, l_ref)
