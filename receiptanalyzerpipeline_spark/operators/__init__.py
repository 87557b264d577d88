"""LLM-data-pipeline operators (SURVEY §2.11): dedup, similarity search,
text analysis — designed shuffle-aware for 100 TB, verified at small SF.
"""
