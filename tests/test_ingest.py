"""S7/S8 ingestion analog: cluster-parallel landing pass + sequential
driver retry with ``fue_reintentado`` tagging (reference
``step1_scraper.py:321-447`` semantics)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.sources.ingest import ingest_catalog


def _catalog(n):
    return [
        {"id": f"ds{i:03d}", "nombre": f"dataset {i}", "categoria": "aire", "url": f"x://{i}"}
        for i in range(n)
    ]


def test_ingest_lands_files_and_manifest(spark, tmp_path):
    raw = str(tmp_path / "raw")

    def fetch(entry):
        return f"period,value\n2020,{entry['id']}\n".encode()

    m = ingest_catalog(spark, _catalog(10), fetch, raw, concurrency=4).collect()
    assert len(m) == 10
    assert all(r.status == "exitoso" and not r.fue_reintentado for r in m)
    assert sorted(os.listdir(raw)) == [f"ds{i:03d}.csv" for i in range(10)]
    one = next(r for r in m if r.dataset_id == "ds003")
    assert one.n_bytes == os.path.getsize(one.path)


def test_ingest_retries_failures_sequentially(spark, tmp_path):
    raw = str(tmp_path / "raw")
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    flaky = {"ds001", "ds004"}
    dead = {"ds007"}
    mdir = str(marker_dir)

    def fetch(entry):
        # self-contained: state via the shared local filesystem, which in
        # local[*] is visible to executor threads and the driver alike
        did = entry["id"]
        if did in dead:
            raise ValueError("permanently broken export")
        marker = os.path.join(mdir, did)
        if did in flaky and not os.path.exists(marker):
            open(marker, "w").close()
            raise TimeoutError("first attempt flake")
        return b"ok"

    m = {r.dataset_id: r for r in ingest_catalog(spark, _catalog(8), fetch, raw).collect()}
    assert len(m) == 8
    # flaky ones recovered on the sequential retry, tagged with the cause
    for did in flaky:
        assert m[did].status == "exitoso"
        assert m[did].fue_reintentado
        assert "first attempt flake" in m[did].intento_previo_fallo
    # the dead one is still a manifest row (not a task failure), retried once
    assert m["ds007"].status == "fallido"
    assert m["ds007"].fue_reintentado
    assert "permanently broken" in m["ds007"].intento_previo_fallo
    # clean entries never retried
    assert not m["ds000"].fue_reintentado
    # only successful downloads landed files
    assert "ds007.csv" not in os.listdir(raw)


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    """A malformed line must land in quarantine with its raw text, not kill
    the job or silently vanish; good rows parse against the schema."""
    from data_pipeline_ine_spark.sources.observation_csv import (
        read_csv_with_quarantine,
    )

    p = tmp_path / "obs.csv"
    p.write_text(
        "year,station,value\n"
        "2020,st1,1.5\n"
        "not_a_year,st2,2.5\n"   # schema violation: INT column gets text
        "2022,st3,3.5\n"
    )
    good, bad = read_csv_with_quarantine(
        spark, str(p), "year INT, station STRING, value DOUBLE"
    )
    rows = {(r.year, r.station, r.value) for r in good.collect()}
    assert rows == {(2020, "st1", 1.5), (2022, "st3", 3.5)}
    [quarantined] = bad.collect()
    assert "not_a_year" in quarantined["_corrupt_record"]


# ---------------------------------------------------------------------------
# raw-text corpus source
# ---------------------------------------------------------------------------
def test_read_text_corpus_line_per_doc(spark, tmp_path):
    from data_pipeline_ine_spark.sources.rawtext import read_text_corpus

    d = tmp_path / "dump"
    d.mkdir()
    (d / "a.txt").write_text("first doc here\n\nsecond doc here\n   \n")
    (d / "b.txt").write_text("third doc here\nfirst doc here\n")

    docs = read_text_corpus(spark, str(d))
    rows = docs.collect()
    # 4 non-blank lines survive; blanks/whitespace dropped at the scan
    assert len(rows) == 4
    assert set(docs.columns) == {"doc_id", "text", "source", "file", "n_chars"}
    assert all(r.n_chars == len(r.text) for r in rows)
    assert {r.source for r in rows} == {"dump"}
    # content-addressed ids: same (file, text) -> same id on a re-read...
    again = {r.doc_id for r in read_text_corpus(spark, str(d)).collect()}
    assert again == {r.doc_id for r in rows}
    # ...and the SAME text in DIFFERENT files gets different ids
    first_ids = {r.doc_id for r in rows if r.text == "first doc here"}
    assert len(first_ids) == 2


def test_read_text_corpus_per_file_composes_with_dedup(spark, tmp_path):
    from data_pipeline_ine_spark.operators.dedup import exact_dup_groups
    from data_pipeline_ine_spark.sources.rawtext import read_text_corpus

    d = tmp_path / "files"
    d.mkdir()
    (d / "x.txt").write_text("alpha beta gamma delta epsilon words")
    (d / "y.txt").write_text("alpha beta gamma delta epsilon words")
    (d / "z.txt").write_text("entirely different file body text")

    docs = read_text_corpus(spark, str(d), per_file=True, source="files")
    assert docs.count() == 3
    groups = exact_dup_groups(docs)
    dup = [g for g in groups.collect() if g.n_docs > 1]
    assert len(dup) == 1 and dup[0].n_docs == 2
