"""Document loader (S10/S11), observability, Structured Streaming runner."""

import csv
import os
import sys
import time

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def test_load_documents_formats(spark, tmp_path):
    from ondine_spark.sources.documents import FakeOCR, load_documents

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("plain text doc")
    (d / "b.md").write_text("# heading\nbody text")
    (d / "c.html").write_text(
        "<html><head><style>x{}</style></head>"
        "<body><h1>Title</h1><p>Para text</p><script>bad()</script></body></html>"
    )
    with open(d / "d.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "city"])
        w.writerow(["ann", "oslo"])
        w.writerow(["bob", "rome"])
    (d / "e.png").write_bytes(b"\x89PNG fake image bytes")
    (d / "skip.bin").write_bytes(b"\x00\x01")  # unknown format → dropped

    docs = load_documents(spark, str(d), ocr=FakeOCR()).collect()
    by_fmt = {r["fmt"]: r for r in docs}
    assert len(docs) == 5
    assert by_fmt["txt"]["text"] == "plain text doc"
    assert "body text" in by_fmt["md"]["text"]
    assert "Title" in by_fmt["html"]["text"]
    assert "bad()" not in by_fmt["html"]["text"]  # script stripped
    assert "name: ann" in by_fmt["csv"]["text"]
    assert by_fmt["png"]["text"].startswith("[ocr-fake bytes=21")
    # stable ids across loads
    again = load_documents(spark, str(d), ocr=FakeOCR()).collect()
    assert {r["doc_id"] for r in docs} == {r["doc_id"] for r in again}


def test_observability_events(spark):
    from ondine_spark import PipelineBuilder, mock_client_factory
    from ondine_spark.observability import CollectingObserver

    obs = CollectingObserver()
    df = spark.createDataFrame([("a", "great stuff")], ["id", "review"])
    (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .with_observer(obs)
        .build()
        .execute()
    )
    kinds = [e.kind for e in obs.events]
    assert kinds == ["pipeline_start", "pipeline_end"]
    assert obs.events[1].payload["rows"] == 1
    assert obs.events[1].payload["api_calls"] == 1

    # error path emits an error event
    obs2 = CollectingObserver()
    bad = (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory(crash_on="great"))
        .with_error_policy("fail").with_max_retries(0)
        .with_observer(obs2)
        .build()
    )
    with pytest.raises(Exception):
        bad.execute()
    assert [e.kind for e in obs2.events] == ["pipeline_start", "error"]


def test_run_file_stream_exactly_once(spark, tmp_path):
    from ondine_spark import PipelineBuilder, mock_client_factory
    from ondine_spark.streaming.runner import run_file_stream

    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "stream-ckpt")

    def write_file(n, base):
        with open(in_dir / f"part{n}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["id", "review"])
            labels = ["great", "terrible", "okay"]
            for i in range(base, base + 10):
                w.writerow([f"k{i:03d}", f"row {i} is {labels[i % 3]}"])

    write_file(0, 0)
    write_file(1, 10)

    p = (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame([("x", "y")], ["id", "review"]),
                        ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .build()
    )
    schema = "id STRING, review STRING"
    run_file_stream(
        p, str(in_dir), "csv", out_dir, ckpt, schema=schema,
        max_files_per_trigger=1,
    )
    got = spark.read.parquet(out_dir)
    assert got.count() == 20
    vals = {r["id"]: r["sentiment"] for r in got.collect()}
    assert vals["k000"] == "positive" and vals["k001"] == "negative"

    # second run with one NEW file: only the new rows are appended
    write_file(2, 20)
    run_file_stream(
        p, str(in_dir), "csv", out_dir, ckpt, schema=schema,
        max_files_per_trigger=1,
    )
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 30  # no reprocessing of old files
    assert got2.select("id").distinct().count() == 30


def test_load_documents_vision_llm_ocr(spark, tmp_path):
    """S11 vision-LLM OCR: image bytes flow through the distributed decode
    UDF into a vision-capable client (deterministic fake here); the
    transcription lands as the document text."""
    from ondine_spark.sources.documents import VisionLLMOCR, load_documents

    d = tmp_path / "scans"
    d.mkdir()
    (d / "page1.png").write_bytes(b"\x89PNG page one pixels")
    (d / "page2.jpg").write_bytes(b"\xff\xd8 page two pixels!")

    def fake_vision_factory():
        class FakeVisionClient:
            model = "fake-vision"

            def complete_vision(self, image_b64, prompt):
                import base64

                raw = base64.b64decode(image_b64)
                assert "Transcribe" in prompt
                return f"transcribed {len(raw)} bytes"

        return FakeVisionClient()

    docs = load_documents(
        spark, str(d), ocr=VisionLLMOCR(fake_vision_factory)
    ).collect()
    texts = {r["source"].rsplit("/", 1)[-1]: r["text"] for r in docs}
    assert texts["page1.png"] == "transcribed 20 bytes"
    assert texts["page2.jpg"] == "transcribed 19 bytes"
    # doc ids stable across reruns
    again = load_documents(
        spark, str(d), ocr=VisionLLMOCR(fake_vision_factory)
    ).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in docs}
