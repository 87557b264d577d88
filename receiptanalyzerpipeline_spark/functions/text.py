"""Text cleanup expressions (reference F4/F6: anarcpt/anarcptlib.py:89,120,127)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_field_tags(c: str | Column) -> Column:
    """Remove ``(ITEM)``-style uppercase tag suffixes and trim.

    ``"COFFEE BEANS (ITEM)"`` → ``"COFFEE BEANS"`` (reference F4).
    """
    return F.trim(F.regexp_replace(_as_col(c), r"\([A-Z]+\)", ""))


def path_stem(c: str | Column) -> Column:
    """Filename stem from a path column — the reference's img_id derivation
    (``image_file.stem`` / ``s3document.split(".")[0]``, F6)."""
    base = F.element_at(F.split(_as_col(c), "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")
