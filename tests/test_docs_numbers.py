"""Docs quote ONE canonical numbers artifact (VERDICT r2 #8): the headline
best AND median figures in README/BASELINE/ARCHITECTURE must match
benchmarks/canonical.json (written by benchmarks/run_all.py from a single
bench.py run set), so best-vs-median optics drift cannot recur."""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANONICAL = os.path.join(ROOT, "benchmarks", "canonical.json")
DOCS = ["README.md", "BASELINE.md", "ARCHITECTURE.md"]


@pytest.fixture(scope="module")
def headline():
    if not os.path.exists(CANONICAL):
        pytest.skip("canonical.json not generated yet (TPU-only artifact)")
    with open(CANONICAL) as f:
        data = json.load(f)
    if "headline" not in data:
        pytest.skip("canonical.json has no headline section")
    return data["headline"]


@pytest.mark.parametrize("doc", DOCS)
def test_doc_quotes_canonical_best_and_median(doc, headline):
    with open(os.path.join(ROOT, doc)) as f:
        text = f.read()
    best = f"{headline['faces_per_sec_best']:.0f}"
    med = f"{headline['faces_per_sec_median']:.0f}"
    xbest = f"{headline['vs_baseline_best']:.1f}"
    xmed = f"{headline['vs_baseline_median']:.1f}"
    for token, what in [(best, "best faces/s"), (med, "median faces/s"),
                        (xbest, "best multiplier"), (xmed, "median multiplier")]:
        assert token in text, (
            f"{doc} does not quote the canonical {what} ({token}); "
            "regenerate docs from benchmarks/canonical.json")


def test_headline_median_not_above_best(headline):
    assert (headline["faces_per_sec_median"]
            <= headline["faces_per_sec_best"])
    assert headline["attempts"] >= 3


# -- accuracy tables must match their artifacts ------------------------------
# (round-3 lesson: the tiered table in BASELINE.md went stale against
# weights/tiered_eval.json once; lock every quoted figure to the artifact)

def test_baseline_tiered_table_matches_artifact():
    path = os.path.join(ROOT, "weights", "tiered_eval.json")
    with open(path) as f:
        tiers = json.load(f)["tiers"]
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = f.read()
    for tier in ("0", "1", "2"):
        t = tiers[tier]
        e, c = t["e2e"], t["crop"]
        row = (f"| {t['detector_recall']:.3f} | {e['tpr@0.6']:.3f} | "
               f"{e['fpr@0.6']:.3f} | {e['auc']:.4f} | "
               f"{c['tpr@0.6']:.3f} | {c['fpr@0.6']:.3f} |")
        assert row in text, (
            f"BASELINE.md tier-{tier} row is stale vs weights/"
            f"tiered_eval.json; expected numeric cells: {row}")


def test_baseline_calibration_quotes_match_artifact():
    path = os.path.join(ROOT, "weights", "calibration.json")
    with open(path) as f:
        m = json.load(f)["metrics_e2e_calibrated"]
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = " ".join(f.read().split())  # doc wraps the quote across lines
    expected = (f"TPR@0.6 {m['tpr@0.6']:.3f}, FPR@0.6 {m['fpr@0.6']:.3f}, "
                f"TPR@0.4 {m['tpr@0.4']:.3f}, FPR@0.4 {m['fpr@0.4']:.3f}, "
                f"AUC {m['auc']:.3f}, EER {m['eer']:.3f}")
    assert expected in text, (
        "BASELINE.md calibration quote is stale vs weights/calibration.json; "
        f"expected: {expected}")


def test_baseline_iresnet18_table_matches_artifact():
    """The MFN -> ir18 comparison table (BASELINE.md 'Hard-tier capacity
    path') quotes tiered_eval_iresnet18.json; it went stale once when a
    round-end snapshot committed mid-training weights (ADVICE r4)."""
    path = os.path.join(ROOT, "weights", "tiered_eval_iresnet18.json")
    if not os.path.exists(path):
        pytest.skip("no iresnet18 eval artifact")
    with open(path) as f:
        tiers = json.load(f)["tiers"]
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = f.read()
    for tier in ("0", "1", "2"):
        t = tiers[tier]
        for token, what in [
            (f"**{t['e2e']['tpr@0.6']:.3f}**", "e2e TPR@0.6"),
            (f"{t['e2e']['fpr@0.6']:.3f}", "e2e FPR@0.6"),
        ]:
            assert token in text, (
                f"BASELINE.md iresnet18 tier-{tier} {what} is stale vs "
                f"weights/tiered_eval_iresnet18.json; expected {token}")


def test_canonical_scale_story_sections_present():
    """gallery_1m + train_mfu go canonical (VERDICT r4 #5): once measured,
    they must stay in every canonical refresh (run_all.py writes them)."""
    if not os.path.exists(CANONICAL):
        pytest.skip("canonical.json not generated yet (TPU-only artifact)")
    with open(CANONICAL) as f:
        data = json.load(f)
    if "gallery_1m" not in data.get("configs", {}):
        pytest.skip("pre-round-5 canonical.json (no gallery_1m yet)")
    g = data["configs"]["gallery_1m"]
    assert g["identities"] == 1_000_000
    assert g["faces_per_sec_best"] > 0
    t = data["train_mfu"]
    assert t["ms_per_step"] > 0 and t["imgs_per_sec"] > 0


def test_baseline_spoof_quotes_match_artifact():
    """The spoof head ships with measured operating characteristics
    (VERDICT r4 weak #3): BASELINE.md quotes weights/spoof_eval.json."""
    path = os.path.join(ROOT, "weights", "spoof_eval.json")
    if not os.path.exists(path):
        pytest.skip("spoof_eval.json not generated yet (TPU-only artifact)")
    with open(path) as f:
        art = json.load(f)
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = f.read()
    for leg in ("crop_matched", "crop_attenuated_50pct", "e2e_frames"):
        m = art[leg]
        row = (f"| {m['auc']:.3f} | {m['eer']:.3f} | {m['tpr@0.5']:.3f} | "
               f"{m['fpr@0.5']:.3f} | {m['accuracy@0.5']:.3f} |")
        assert row in text, (
            f"BASELINE.md spoof table row for {leg} is stale vs "
            f"weights/spoof_eval.json; expected cells: {row}")


def test_baseline_flip_tta_quotes_match_artifact():
    """The flip-TTA gate-decision table (BASELINE.md 'Flip-TTA clears the
    gate') quotes benchmarks/flip_tta_profile.json — the measured basis for
    shipping FRP_PROFILE=accuracy."""
    path = os.path.join(ROOT, "benchmarks", "flip_tta_profile.json")
    if not os.path.exists(path):
        pytest.skip("no flip-TTA profile artifact")
    with open(path) as f:
        tiers = json.load(f)["tiers"]
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = f.read()
    for tier in ("0", "1", "2", "3"):
        b, fl = tiers[tier]["baseline"], tiers[tier]["flip_avg"]
        tpr = f"{fl['tpr@0.6']:.3f}"
        row = (f"{b['tpr@0.6']:.3f} → {tpr if tier != '2' else f'**{tpr}**'} "
               f"| {fl['fpr@0.6']:.3f} | {fl['auc']:.4f} | {fl['eer']:.3f} |")
        assert row in text, (
            f"BASELINE.md flip-TTA tier-{tier} row is stale vs "
            f"benchmarks/flip_tta_profile.json; expected cells: {row}")
