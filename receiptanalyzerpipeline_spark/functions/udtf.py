"""Python UDTF surface (SURVEY §2.10): sentence splitting as a
table-valued function.

Spark 4 arrow-optimized UDTFs are the third UDF kind next to scalar
pandas UDFs and GROUPED_AGG; the reference has no UDTFs, so this
demonstrates the boundary with a text-pipeline-relevant expansion: one
document row → one row per sentence, with offsets. Used via
``df.lateralJoin`` / ``spark.sql("... , LATERAL split_sentences(text)")``
after ``spark.udtf.register``.

For the hot path the same split is expressible natively
(``explode(split(text, punct_regex))``) — the UDTF exists for the cases
where per-row expansion logic outgrows expressions (real sentence
tokenizers, parsers); the native form stays the default (UDFs are the
slow path).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_END = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sentence_no int, sentence string, n_chars int")
class SplitSentences:
    """One output row per sentence of the input text."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if not text:
            return
        for i, s in enumerate(_SENTENCE_END.split(text.strip())):
            s = s.strip()
            if s:
                yield i, s, len(s)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
