"""write_jsonl_shards: determinism, round-trip fidelity, manifest
integrity, crash-leftover handling, stale-shard cleanup."""

import gzip
import hashlib
import json
import os

import pytest

from gdelt_extractor_spark.sinks.jsonl import write_jsonl_shards


def _df(spark, n=40):
    return spark.createDataFrame(
        [(i, f"doc {i} text", i % 3) for i in range(n)],
        "doc_id long, text string, grp int",
    )


def _read_all(path):
    out = []
    for name in sorted(os.listdir(path)):
        if not name.startswith("shard-"):
            continue
        opener = gzip.open if name.endswith(".gz") else open
        with opener(os.path.join(path, name), "rt") as fh:
            out.extend(json.loads(line) for line in fh)
    return out


def test_roundtrip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "out")
    os.makedirs(path)
    manifest = write_jsonl_shards(_df(spark), path, n_shards=4)
    assert len(manifest) == 4
    rows = _read_all(path)
    assert sorted(r["doc_id"] for r in rows) == list(range(40))
    assert rows[0].keys() == {"doc_id", "text", "grp"}
    assert sum(m["n_rows"] for m in manifest) == 40
    with open(os.path.join(path, "manifest.json")) as fh:
        assert json.load(fh) == manifest
    for m in manifest:
        with open(os.path.join(path, m["file"]), "rb") as fh:
            assert hashlib.sha256(fh.read()).hexdigest() == m["sha256"]


def test_byte_deterministic(spark, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(pa), os.makedirs(pb)
    write_jsonl_shards(_df(spark), pa, n_shards=3)
    write_jsonl_shards(_df(spark).repartition(7), pb, n_shards=3)
    for name in os.listdir(pa):
        if name.startswith("shard-"):
            with open(os.path.join(pa, name), "rb") as fa, open(
                os.path.join(pb, name), "rb"
            ) as fb:
                assert fa.read() == fb.read(), name


def test_stale_shards_and_staging_cleanup(spark, tmp_path):
    path = str(tmp_path / "out")
    os.makedirs(path)
    write_jsonl_shards(_df(spark), path, n_shards=6)
    # leftover staging from a crash + a stale shard from a wider export
    os.makedirs(os.path.join(path, "_staging"))
    with open(os.path.join(path, "_staging", "junk"), "w") as fh:
        fh.write("x")
    write_jsonl_shards(_df(spark), path, n_shards=2)
    names = [n for n in os.listdir(path) if n.startswith("shard-")]
    assert len(names) == 2  # 4 stale shards removed
    assert not os.path.exists(os.path.join(path, "_staging"))
    assert sorted(r["doc_id"] for r in _read_all(path)) == list(range(40))


def test_uncompressed_and_column_order(spark, tmp_path):
    path = str(tmp_path / "out")
    os.makedirs(path)
    write_jsonl_shards(
        _df(spark), path, columns=["text", "doc_id"], n_shards=1,
        compress=False,
    )
    with open(os.path.join(path, "shard-00000.jsonl")) as fh:
        first = fh.readline()
    assert first.index('"text"') < first.index('"doc_id"')


def test_object_store_refused(spark):
    with pytest.raises(NotImplementedError):
        write_jsonl_shards(_df(spark), "s3://bucket/out")
