"""Committed on-chip benchmark record (VERDICT r4 item 2 wedge-proofing):
append/replay round-trip, latest-wins semantics, torn-line tolerance."""
import json

from kryst_tpu.utils.chiprecord import append_chip_record, latest_records


def test_append_and_latest_roundtrip(tmp_path):
    p = str(tmp_path / "rec.jsonl")
    append_chip_record("pcg_1M", 23.8, "us", 1.5, source="t", path=p)
    append_chip_record("vcycle_1M", 0.41, "ms", 2.0, source="t", path=p)
    append_chip_record("pcg_1M", 16.5, "us", 2.2, source="t2", path=p)
    recs = latest_records(p)
    # latest value per metric, first-seen metric order
    assert [r["metric"] for r in recs] == ["pcg_1M", "vcycle_1M"]
    assert recs[0]["value"] == 16.5 and recs[0]["source"] == "t2"
    assert recs[1]["value"] == 0.41
    # every line carries a UTC timestamp; vs_baseline rounded
    raw = [json.loads(l) for l in open(p)]
    assert all(r["ts"].endswith("Z") for r in raw)
    assert raw[2]["vs_baseline"] == 2.2


def test_latest_records_skips_torn_and_foreign_lines(tmp_path):
    p = str(tmp_path / "rec.jsonl")
    append_chip_record("m", 1.0, "ms", None, path=p)
    with open(p, "a") as f:
        f.write('{"metric": "torn", "val')  # torn write
        f.write("\n\n")
        f.write('{"no_metric_key": 1}\n')
        f.write('{"metric": "m2"}\n')  # missing value
    append_chip_record("m", 2.0, "ms", None, path=p)
    recs = latest_records(p)
    assert [r["metric"] for r in recs] == ["m"]
    assert recs[0]["value"] == 2.0


def test_latest_records_missing_file(tmp_path):
    assert latest_records(str(tmp_path / "absent.jsonl")) == []
