"""LLM-data-pipeline queries: dedup / similarity / text analysis (SURVEY §2.11).

Filled in by operators/ modules; registered here.
"""

from __future__ import annotations
