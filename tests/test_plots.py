"""Evaluation artifact tests: figure PNGs + CSVs exist and are well-formed
(reference evaluation/scripts/ plot parity), and the -disambiguate scoring
mode behaves sanely (single-solution errors are never better than the
min-over-candidates scoring on the same problems)."""

import csv
import os

import numpy as np


def test_solver_artifacts(tmp_path):
    from sphericalsfm_tpu.eval.experiments import solver_artifacts

    out = str(tmp_path / "artifacts")
    paths = solver_artifacts(
        out, trials=60, stability_trials=120, ransac_trials=8,
        noises_px=(0.0, 1.0, 2.0),
    )
    assert len(paths) > 0
    for p in paths:
        assert os.path.exists(p), p
        assert os.path.getsize(p) > 500, p  # a real PNG, not an empty file
    # figure set parity: curves + per-solver boxes + stability KDE + ransac
    figs = os.listdir(os.path.join(out, "figures"))
    for expected in ("frob_noise.png", "rot_noise.png", "trans_noise.png",
                     "stability_frob.png", "ransac_rot.png",
                     "box_rot_spherical_3pt.png"):
        assert expected in figs, expected
    for csv_name in ("noise_comparison.csv", "stability.csv", "ransac.csv"):
        with open(os.path.join(out, csv_name)) as f:
            rows = list(csv.DictReader(f))
        assert rows, csv_name


def test_disambiguate_scoring():
    """Disambiguated (single-solution) errors must be >= the flattering
    min-over-candidates errors, and still small on clean data."""
    from sphericalsfm_tpu.eval.experiments import relpose_comparison

    rows_flat = relpose_comparison(
        os.devnull, angles_deg=(2.0,), noises_px=(0.5,), trials=200,
        disambiguate=False,
    )
    rows_dis = relpose_comparison(
        os.devnull, angles_deg=(2.0,), noises_px=(0.5,), trials=200,
        disambiguate=True,
    )
    for name in ("spherical_3pt", "general_5pt"):
        flat = rows_flat[0][f"median_frob_{name}"]
        dis = rows_dis[0][f"median_frob_{name}"]
        # single-solution scoring can only be >= the flattering min-over-
        # candidates scoring (up to median jitter from the ok-mask)
        assert dis >= flat * 0.9, (name, flat, dis)
    # the spherical solver is the one that stays accurate on spherical
    # motion; general 5-pt legitimately degrades at this near-zero baseline
    assert rows_dis[0]["median_frob_spherical_3pt"] < 0.1
    assert rows_dis[0]["median_rot_deg_spherical_3pt"] < 1.0
