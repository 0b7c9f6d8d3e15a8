"""Input preprocessing chain (P7).

Port of the reference's text-cleaning chain
(reference: ondine/utils/input_preprocessing.py:45-160): Unicode NFC →
control-char → space → special-char scrub → whitespace collapse →
word-boundary truncation. Exact parity matters more than raw speed here
(these feed prompts), so the chain runs as the same pure-Python functions
inside ONE Arrow-batched pandas UDF. A JVM-only approximation
(``clean_text_expr``) exists for scale paths that tolerate divergence on
exotic Unicode.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_TM = re.compile(r"[®™©℗℠]")
_ZW = re.compile(r"[​-‏﻿]")
_WS = re.compile(r"\s+")


def normalize_unicode(text: str) -> str:
    return unicodedata.normalize("NFC", text)


def remove_control_chars(text: str) -> str:
    return "".join(
        ch if unicodedata.category(ch)[0] != "C" else " " for ch in text
    )


def clean_special_chars(text: str, preserve: str = r",\-/\.\(\)&") -> str:
    text = _TM.sub("", text)
    text = text.replace("“", '"').replace("”", '"')
    text = text.replace("‘", "'").replace("’", "'")
    text = _ZW.sub("", text)
    return re.sub(f"[^\\w\\s{preserve}]", " ", text)


def normalize_whitespace(text: str) -> str:
    text = text.replace("\t", " ").replace("\n", " ").replace("\r", " ")
    return _WS.sub(" ", text).strip()


def truncate_at_boundary(text: str, max_length: int = 500) -> str:
    """Word/delimiter-boundary truncation with '...' suffix
    (reference: input_preprocessing.py:95-122)."""
    if len(text) <= max_length:
        return text
    limit = max_length - 3
    min_keep = int(max_length * 0.7)
    for delim in ["|", ";", " - ", "  "]:
        pos = text.rfind(delim, 0, limit)
        if pos > min_keep:
            return text[:pos].strip() + "..."
    pos = text.rfind(" ", 0, limit)
    if pos > min_keep:
        return text[:pos].strip() + "..."
    return text[:limit].strip() + "..."


def preprocess_text(text: str | None, max_length: int = 500) -> str | None:
    if text is None:
        return None
    for step in (normalize_unicode, remove_control_chars, clean_special_chars,
                 normalize_whitespace):
        text = step(text)
    return truncate_at_boundary(text, max_length)


def preprocess_udf(max_length: int = 500) -> "F.pandas_udf":
    @F.pandas_udf("string")
    def clean(s: pd.Series) -> pd.Series:
        return s.map(lambda t: preprocess_text(t, max_length))

    return clean


def clean_text_expr(col: Column) -> Column:
    """JVM-only approximation (no NFC/category tables): strip control and
    trademark chars, collapse whitespace. For scale paths where Python
    per-char processing would dominate."""
    c = F.regexp_replace(col, r"[\p{Cntrl}]", " ")
    c = F.regexp_replace(c, "[®™©℗℠]", "")
    c = F.regexp_replace(c, "[​-‏﻿]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))
