"""scripts/quality_summary.py: the sweep decision table aggregates each
arm's quality_<tag>.json with its curves_<tag>.csv gain decomposition and
sorts by best-of-N NRMSE."""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from quality_summary import summarize  # noqa: E402


def _write_arm(report: Path, tag: str, nrmse: float, gain: float,
               with_curves: bool = True):
    (report / f"quality_{tag}.json").write_text(json.dumps({
        "best_of_N_nrmse_mean": nrmse,
        "all_preds_nrmse_mean": nrmse * 1.2,
        "full_error": {"rel_to_closest_match_mean": nrmse / 0.005},
    }))
    if not with_curves:
        return
    # one target (id 0): a -1 pred-id target row + two prediction rows at
    # an exact multiplicative gain -> analyze() recovers gain, corr 1.0
    t = np.linspace(0, -1.2, 11)
    rows = [np.concatenate([[0, -1], t]),
            np.concatenate([[0, 0], gain * t]),
            np.concatenate([[0, 1], gain * 1.01 * t])]
    hdr = "target,pred," + ",".join(f"f{i}" for i in range(11))
    np.savetxt(report / f"curves_{tag}.csv", np.stack(rows),
               delimiter=",", header=hdr, comments="")


def test_summarize_sorts_and_joins_gain(tmp_path):
    _write_arm(tmp_path, "step8000_w5.0_phi0.0", 0.22, 1.4)
    _write_arm(tmp_path, "step8000_w2.0_phi0.0", 0.04, 1.02)
    _write_arm(tmp_path, "step8000_w2.0_phi0.0_steps32", 0.06, 1.05,
               with_curves=False)
    rows = summarize(tmp_path)
    assert [r["tag"] for r in rows] == [
        "step8000_w2.0_phi0.0", "step8000_w2.0_phi0.0_steps32",
        "step8000_w5.0_phi0.0"]
    best = rows[0]
    assert best["best_of_N"] == 0.04
    np.testing.assert_allclose(best["gain"], 1.02 * 1.005, rtol=1e-2)
    np.testing.assert_allclose(best["corr_min"], 1.0, atol=1e-12)
    # after-ideal-gain floor ~0 for pure-gain predictions
    assert best["after_gain"] < 1e-10
    # arm without curves still summarized, gain columns absent
    assert "gain" not in rows[1]
