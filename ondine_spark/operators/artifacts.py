"""Persistence for trained pipeline artifacts (train once, reuse across runs).

A 100-TB pipeline trains its small model-like artifacts — BPE merge
tables, PQ codebooks, IVF coarse centroids — ONCE on a bounded sample
and then reuses them for every later run (and for the streaming /
incremental variants of the same job). These artifacts are all tiny
(kilobytes to a few MB) driver-side values, so persistence is a single
scheme-aware JSON file, not a distributed write; the Spark ML quality
classifier already persists natively via ``PipelineModel.save/load``.

Reference parity note: the reference keeps trained state implicit in
its process lifetime (no artifact store); this module is part of the
training-data extension layer, where reuse across runs is the normal
mode of operation.
"""

from __future__ import annotations

import json
import os

__all__ = [
    "save_artifact",
    "load_artifact",
    "save_bpe_tokenizer",
    "load_bpe_tokenizer",
]

_FORMAT_VERSION = 1

try:  # py4j ships with pyspark; guarded for spark-free unit imports
    from py4j.protocol import Py4JError, Py4JJavaError
except Exception:  # pragma: no cover
    class Py4JJavaError(Exception):
        pass

    class Py4JError(Exception):
        pass


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _has_scheme(path: str) -> bool:
    return "://" in path


def _write_text(path: str, text: str, spark=None) -> None:
    """Scheme-aware small-file write: Hadoop FS when a session is given
    (hdfs://, s3a://, ... all work on a cluster), plain local IO otherwise.

    Atomic: writes ``<path>.tmp`` then renames over the target, so a
    driver crash mid-write never truncates the previously good artifact.
    A failure on a scheme'd path RAISES — silently falling back to local
    IO would 'succeed' by writing ./s3a:/... on the driver's disk while
    the artifact never reaches the store. The local fallback exists only
    for schemeless paths when py4j is unavailable (plain tests)."""
    if spark is not None:
        try:
            fs, jpath = _hadoop_fs(spark, path)
            jtmp = spark._jvm.org.apache.hadoop.fs.Path(path + ".tmp")
            out = fs.create(jtmp, True)
            try:
                out.write(bytearray(text.encode("utf-8")))
            finally:
                out.close()
            fs.delete(jpath, False)  # rename won't overwrite on HDFS
            if not fs.rename(jtmp, jpath):
                raise IOError(f"rename {path}.tmp -> {path} failed")
            return
        except Py4JJavaError:
            raise  # a real JVM-side filesystem failure, any path kind
        except (Py4JError, AttributeError):
            if _has_scheme(path):
                raise
            # py4j gap only (no gateway / fake session) → local write below.
            # A genuine Hadoop failure is Py4JJavaError and propagates, so
            # a cluster whose default FS is HDFS never silently "succeeds"
            # onto the driver's local disk.
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)


def _read_text(path: str, spark=None) -> str:
    if spark is not None:
        try:
            fs, jpath = _hadoop_fs(spark, path)
            stream = fs.open(jpath)
            try:
                # py4j passes byte[] buffers BY VALUE (Java-side writes
                # into a passed bytearray never reach Python), so a
                # read-into-buffer loop silently yields nothing — drain
                # the stream JVM-side instead
                return str(
                    spark._jvm.org.apache.commons.io.IOUtils.toString(
                        stream, "UTF-8"
                    )
                )
            finally:
                stream.close()
        except Py4JJavaError:
            raise  # a real JVM-side filesystem failure, any path kind
        except (Py4JError, AttributeError):
            if _has_scheme(path):
                raise
    with open(path, encoding="utf-8") as f:
        return f.read()


def save_artifact(path: str, kind: str, payload, spark=None) -> None:
    """Persist a JSON-serializable trained artifact with a kind tag.

    ``kind`` is free-form but the conventional values are
    ``"bpe_tokenizer"``, ``"pq_codebooks"``, ``"ivf_centroids"``; pass
    ``spark`` to write through the Hadoop FS API (scheme-aware).
    """
    doc = {"kind": kind, "format_version": _FORMAT_VERSION, "payload": payload}
    _write_text(path, json.dumps(doc, separators=(",", ":")), spark)


def load_artifact(path: str, expect: str | None = None, spark=None):
    """Load a saved artifact; with ``expect`` set, the kind must match."""
    doc = json.loads(_read_text(path, spark))
    if not isinstance(doc, dict) or "payload" not in doc:
        raise ValueError(f"{path} is not an ondine_spark artifact file")
    if doc.get("format_version", 0) > _FORMAT_VERSION:
        raise ValueError(
            f"{path} was written by a newer format "
            f"(v{doc['format_version']} > v{_FORMAT_VERSION})"
        )
    if expect is not None and doc.get("kind") != expect:
        raise ValueError(
            f"{path} holds a {doc.get('kind')!r} artifact, expected {expect!r}"
        )
    return doc["payload"]


def save_bpe_tokenizer(tok, path: str, spark=None) -> None:
    save_artifact(path, "bpe_tokenizer", tok.to_dict(), spark)


def load_bpe_tokenizer(path: str, spark=None):
    from ondine_spark.operators.tokenizer import BpeTokenizer

    return BpeTokenizer.from_dict(
        load_artifact(path, expect="bpe_tokenizer", spark=spark)
    )
