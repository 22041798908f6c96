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
