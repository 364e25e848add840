"""JSONL corpus I/O: round-trip fidelity, corrupt-line auditing, gzip
sharding."""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.sources.jsonl import read_jsonl, write_jsonl
from data_pipeline_ine_spark.sources.registry import load_table


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_jsonl_roundtrip_gzip_sharded(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, num_shards=4)
    shards = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(shards) == 4
    good, corrupt = read_jsonl(spark, out)
    assert corrupt.count() == 0
    assert _rows(good) == _rows(docs)


def test_jsonl_corrupt_lines_are_audited_not_dropped(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}',
        "this is not json at all",
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}',
        '{"truncated": ',
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines))
    good, corrupt = read_jsonl(spark, str(p))
    assert good.count() == 2
    assert {r.doc_id for r in good.collect()} == {1, 2}
    bad = {r.raw_line for r in corrupt.collect()}
    assert bad == {"this is not json at all", '{"truncated": '}


def test_jsonl_reads_externally_gzipped_files(spark, tmp_path):
    p = tmp_path / "gz"
    p.mkdir()
    payload = '{"doc_id": 7, "text": "zipped", "lang": "en", "source": "g", "n_chars": 6}\n'
    with gzip.open(p / "shard-00.jsonl.gz", "wt") as f:
        f.write(payload)
    good, corrupt = read_jsonl(spark, str(p))
    assert corrupt.count() == 0
    row = good.first()
    assert (row.doc_id, row.text) == (7, "zipped")
