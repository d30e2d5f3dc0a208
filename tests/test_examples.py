"""The worked README example (examples/readme_spider.py) runs end to
end: pagination discovery from page 1, fan-out to pages 2..N, item
extraction on every page, dual {table, CSV-with-headers} storage —
the reference README's spider (README.md:85-153) on synthetic data."""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples")
)

from readme_spider import JOBS_PER_PAGE, TOTAL_PAGES, run  # noqa: E402


def test_readme_spider_end_to_end(spark, tmp_path):
    wd = str(tmp_path / "wd")
    job = run(spark, wd)
    items = job.items()
    want = TOTAL_PAGES * JOBS_PER_PAGE
    assert items.count() == want
    rows = {r.image_id: r.caption for r in items.collect()}
    assert rows["http://jobs.test/jobs/0"] == "Title 0"
    assert rows["http://jobs.test/jobs/19"] == "Title 19"
    # CSV sink: header row projected in declared order, one line per item
    csv_files = sorted(glob.glob(os.path.join(wd, "items_csv", "e_*", "*.csv")))
    assert csv_files
    lines = []
    for f in csv_files:
        with open(f, newline="") as fh:
            lines += [ln for ln in fh.read().split("\r\n") if ln]
    headers = {ln for ln in lines if ln == "image_id,caption,epoch"}
    assert headers, "projected CSV header missing"
    data = [ln for ln in lines if ln and ln not in headers]
    assert len(data) == want
    assert any(ln.startswith("http://jobs.test/jobs/0,Title 0,") for ln in data)
    # table sink (ETS set-semantics): merged view keyed by image_id
    merged = job.sink.sinks[0].merged(spark)
    assert merged.count() == want


from training_data_pipeline import (  # noqa: E402
    N_BASE_DOCS, N_EXACT_DUPS, N_JUNK, N_NEAR_DUPS,
    run as run_training_pipeline,
)


def test_training_data_pipeline_end_to_end(spark, tmp_path):
    """The beyond-reference worked example: quality gate drops the
    junk, exact dedup removes the planted copies, MinHash removes the
    planted near-dups, and the pruned IVF query returns the probe doc
    as its own nearest neighbor."""
    out = run_training_pipeline(spark, str(tmp_path))
    assert out["total_docs"] == (
        N_BASE_DOCS + N_EXACT_DUPS + N_NEAR_DUPS + N_JUNK
    )
    # the junk rows fail the quality/length gate
    assert out["after_quality_gate"] == N_BASE_DOCS + N_EXACT_DUPS + N_NEAR_DUPS
    # exact dedup folds every planted copy into its original
    assert out["after_exact_dedup"] == N_BASE_DOCS + N_NEAR_DUPS
    # near-dedup folds every planted one-word-swap revision
    assert out["near_dup_pairs"] >= N_NEAR_DUPS
    assert out["training_docs"] == N_BASE_DOCS
    # retrieval sanity: the probe doc is its own nearest neighbor at
    # cosine 1.0 through the partition-pruned IVF read
    top_id, top_cos = out["neighbors"][0]
    assert top_id == out["probe_doc_id"] and top_cos == 1.0
