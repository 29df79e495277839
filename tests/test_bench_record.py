"""bench.py's measured-record readers (round 5).

The driver's end-of-round bench derives its HEADLINE from
docs/adaptive500.json (the measured 500-row `--schedule adaptive` encode);
a silently-unreadable record would quietly fall back to the synthesized
8-image estimate. Pin the reader against the committed records and its
None-fallback contract.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)  # cheap: jax imports live inside main()
    return mod


def test_reads_committed_adaptive_record():
    b = _bench()
    rec = b.load_measured_500(b.MEASURED_500_PATH)
    assert rec is not None, "committed docs/adaptive500.json must parse"
    assert rec["n_rows"] == 500
    assert rec["wall_s"] > 0
    assert 1.9 < rec["bpp"] < 2.0
    assert rec["psnr"] > 40.0
    # the headline the README quotes is n_rows / wall_s
    assert abs(rec["n_rows"] / rec["wall_s"] - 0.653) < 0.02


def test_reads_committed_quality_record():
    b = _bench()
    rec = b.load_measured_500(b.MEASURED_Q500_PATH)
    assert rec is not None
    assert rec["psnr"] > 41.5
    assert rec["finetune_epochs"] <= rec["finetune_budget"]


def test_missing_and_malformed_records_return_none(tmp_path):
    b = _bench()
    assert b.load_measured_500(str(tmp_path / "nope.json")) is None
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"points": [{"timings": {}}]}))
    assert b.load_measured_500(str(bad)) is None
