"""Custom Python data source tests (SURVEY §2.1 S5: ManagedSource as a
connector with engine-owned open/close lifecycle)."""

import glob
import json
import os

import pytest

from simple_stream_processor_spark.sources.managed_jsonl import ManagedJsonlDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ManagedJsonlDataSource)
    return spark


def _write_jsonl(tmpdir, name, rows):
    path = os.path.join(tmpdir, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


def test_jsonl_source_reads_all_files(registered, tmp_path):
    d = str(tmp_path / "data")
    os.makedirs(d)
    _write_jsonl(d, "a.jsonl", [{"k": 1, "s": "x"}, {"k": 2, "s": "y"}])
    _write_jsonl(d, "b.jsonl", [{"k": 3, "s": "z"}])
    df = registered.read.format("ssp_jsonl").schema("k long, s string").option("path", d).load()
    assert sorted((r.k, r.s) for r in df.collect()) == [(1, "x"), (2, "y"), (3, "z")]


def test_jsonl_source_close_exactly_once_per_partition(registered, tmp_path):
    d = str(tmp_path / "data")
    log = str(tmp_path / "log")
    os.makedirs(d)
    os.makedirs(log)
    _write_jsonl(d, "a.jsonl", [{"k": 1}])
    _write_jsonl(d, "b.jsonl", [{"k": 2}])
    df = (
        registered.read.format("ssp_jsonl")
        .schema("k long")
        .option("path", d)
        .option("lifecycle_log", log)
        .load()
    )
    assert df.count() == 2
    opens = glob.glob(os.path.join(log, "open-*"))
    closes = glob.glob(os.path.join(log, "close-*"))
    assert len(opens) == 2 and len(closes) == 2  # one pair per file partition


def test_jsonl_source_closes_on_parse_error(registered, tmp_path):
    d = str(tmp_path / "data")
    log = str(tmp_path / "log")
    os.makedirs(d)
    os.makedirs(log)
    with open(os.path.join(d, "bad.jsonl"), "w") as f:
        f.write('{"k": 1}\nNOT JSON\n')
    df = (
        registered.read.format("ssp_jsonl")
        .schema("k long")
        .option("path", d)
        .option("lifecycle_log", log)
        .load()
    )
    with pytest.raises(Exception):
        df.collect()
    # the resource still closed despite the mid-stream error (ensuring parity)
    assert len(glob.glob(os.path.join(log, "close-*"))) >= 1
