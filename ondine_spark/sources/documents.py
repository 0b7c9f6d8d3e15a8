"""Document loader (S10) + OCR providers (S11) for KB ingestion.

Reference (ondine/knowledge/loader.py:34-221): load PDF (PyMuPDF), md/txt,
csv, html, images via OCR; directory walk with per-format dispatch.

Spark-first: the scale path is ``spark.read.format("binaryFile")`` over a
directory — decoding happens distributed, per executor, via JVM string
decode for text formats and a pandas UDF for binary ones. Driver-side
parsing only for formats whose libraries are driver-bound (xlsx, pdf).
The binary codecs (PyMuPDF, tesseract) are not installed in this
environment — import-guarded with a deterministic fake OCR for tests
(plumbing real, pixels fake; same policy as operators/multimodal).
"""

from __future__ import annotations

import html.parser
import io
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEXT_SUFFIXES = (".txt", ".md", ".rst", ".log")
HTML_SUFFIXES = (".html", ".htm", ".xml")
CSV_SUFFIXES = (".csv", ".tsv")
IMAGE_SUFFIXES = (".png", ".jpg", ".jpeg", ".tiff", ".bmp")


class _HTMLTextExtractor(html.parser.HTMLParser):
    def __init__(self):
        super().__init__()
        self.chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip and data.strip():
            self.chunks.append(data.strip())


def html_to_text(markup: str) -> str:
    p = _HTMLTextExtractor()
    p.feed(markup)
    return "\n".join(p.chunks)


class OCRProvider(Protocol):
    def extract(self, image_bytes: bytes) -> str: ...


class FakeOCR:
    """Deterministic OCR stand-in: describes the payload instead of reading
    pixels (tesseract/doctr are not installed here)."""

    def extract(self, image_bytes: bytes) -> str:
        import hashlib

        return (
            f"[ocr-fake bytes={len(image_bytes)} "
            f"md5={hashlib.md5(image_bytes).hexdigest()[:12]}]"
        )


class VisionLLMOCR:
    """OCR via a vision-capable LLM client (reference:
    ondine/knowledge/ocr.py:47-215, the vision-LLM provider of its
    three-provider catalog). ``client_factory`` builds an object exposing
    ``complete_vision(image_b64, prompt)`` returning an LLMResult (or a
    bare string) — a factory rather than a live client so the provider
    pickles cleanly into the distributed decode UDF and each executor
    worker builds its own connection. Base64 encoding happens worker-side
    next to the binaryFile scan, so image bytes never route through the
    driver."""

    def __init__(self, client_factory,
                 prompt: str = "Transcribe all text in this image. "
                               "Return only the transcription."):
        self.client_factory = client_factory
        self.prompt = prompt
        self._client = None

    def extract(self, image_bytes: bytes) -> str:
        import base64

        if self._client is None:
            self._client = self.client_factory()
        b64 = base64.b64encode(image_bytes).decode("ascii")
        r = self._client.complete_vision(b64, self.prompt)
        return r if isinstance(r, str) else r.text


def doctr_ocr():  # pragma: no cover - doctr not installed here
    """Reference parity: the DocTR provider of ondine/knowledge/ocr.py."""
    try:
        from doctr.io import DocumentFile
        from doctr.models import ocr_predictor
    except ImportError as e:
        raise ImportError(
            "python-doctr not installed; use FakeOCR/VisionLLMOCR or "
            "install python-doctr"
        ) from e

    class DocTROCR:
        def __init__(self):
            self.model = ocr_predictor(pretrained=True)

        def extract(self, image_bytes: bytes) -> str:
            doc = DocumentFile.from_images([image_bytes])
            result = self.model(doc)
            return result.render()

    return DocTROCR()


def tesseract_ocr():  # pragma: no cover - not installed here
    try:
        import pytesseract  # noqa
        from PIL import Image  # noqa
    except ImportError as e:
        raise ImportError(
            "pytesseract/Pillow not installed; use FakeOCR or install them"
        ) from e

    class TesseractOCR:
        def extract(self, image_bytes: bytes) -> str:
            from PIL import Image
            import pytesseract

            return pytesseract.image_to_string(
                Image.open(io.BytesIO(image_bytes))
            )

    return TesseractOCR()


def load_documents(
    spark: SparkSession,
    path: str,
    ocr: OCRProvider | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Directory/file → DataFrame(doc_id, text, source, fmt).

    Distributed path: binaryFile scan + per-row decode. doc_id is the
    md5-derived id of the source path (stable across runs)."""
    from ondine_spark.functions.similarity import md5_long

    pattern_path = path
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(pattern_path)
        .select("path", "content")
    )

    def decode_one(p: str, content: bytes) -> str | None:
        low = p.lower()
        try:
            if low.endswith(TEXT_SUFFIXES):
                return content.decode("utf-8", errors="replace")
            if low.endswith(HTML_SUFFIXES):
                return html_to_text(content.decode("utf-8", errors="replace"))
            if low.endswith(CSV_SUFFIXES):
                text = content.decode("utf-8", errors="replace")
                # reference flattens csv rows to "col: val" lines
                import csv as _csv

                rows = list(_csv.DictReader(io.StringIO(text)))
                return "\n".join(
                    ", ".join(f"{k}: {v}" for k, v in r.items()) for r in rows
                )
            if low.endswith(IMAGE_SUFFIXES):
                if ocr is None:
                    return None
                return ocr.extract(bytes(content))
            if low.endswith(".pdf"):
                try:  # pragma: no cover - pymupdf not installed here
                    import fitz

                    doc = fitz.open(stream=bytes(content), filetype="pdf")
                    return "\n".join(page.get_text() for page in doc)
                except ImportError:
                    return None
            return None
        except Exception:
            return None

    @F.pandas_udf(T.StringType())
    def decode_udf(paths: pd.Series, contents: pd.Series) -> pd.Series:
        return pd.Series(
            [decode_one(p, c) for p, c in zip(paths, contents)]
        )

    out = df.select(
        F.col("path").alias("source"),
        decode_udf(F.col("path"), F.col("content")).alias("text"),
    ).filter(F.col("text").isNotNull())
    return out.select(
        md5_long(F.col("source")).alias("doc_id"), "text", "source",
        F.element_at(F.split(F.col("source"), r"\."), -1).alias("fmt"),
    )
