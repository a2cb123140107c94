"""Contract tests for the driver-graded registry prefix (corpus.GRADED_WINDOW).

The external CORRECTNESS gate grades the first 50 registry entries in
insertion order — these tests pin that the curated window stays exactly
50, leads the registry, is fully oracle-backed (the driver has no
rows-only mode, so a no-oracle entry is a guaranteed red — r2's
dedup_minhash_lsh slot), and spans every SURVEY §2 family tag.
"""

from __future__ import annotations

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import GRADED_WINDOW, load_all

# every window slot must be oracle-backed (r3 verdict item 3)
ROWS_ONLY_OK: set[str] = set()


def test_window_is_exactly_50_and_leads_registry():
    reg = load_all()
    assert len(GRADED_WINDOW) == 50
    assert list(reg)[:50] == list(GRADED_WINDOW)


def test_window_is_oracle_backed():
    reg = load_all()
    missing = [
        n for n in GRADED_WINDOW if reg[n].oracle is None and n not in ROWS_ONLY_OK
    ]
    assert not missing, f"window entries without an oracle: {missing}"


def test_window_spans_every_family():
    reg = load_all()
    tags = {t for n in GRADED_WINDOW for t in reg[n].tags}
    expected = {
        "A1", "A2", "A4", "A5", "A6", "A7", "A8", "A9",
        "B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B9", "B10",
    }
    assert expected.issubset(tags), f"families missing from window: {expected - tags}"
