"""Status docs must quote the canonical BENCH_DETAIL.json numbers
(VERDICT r4 weak #1: BASELINE.md/PERF.md drifted from the driver-captured
JSON). Headline claims carry `<!-- bench:PATH -->` markers; the checker
fails on drift or if the markers are removed."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_status_docs_match_bench_detail():
    from tools.check_docs import check

    failures, n_markers = check(verbose=False)
    assert not failures, "\n".join(failures)
    # the three r4-drifting claims (flagship %, attention %, vs_baseline)
    # must stay guarded
    assert n_markers >= 4
