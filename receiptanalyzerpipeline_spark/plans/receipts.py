"""Receipt-domain queries: Textract flatten → pivot → curated tables (SURVEY M2).

Filled in by sources/textract.py; registered here.
"""

from __future__ import annotations
