"""Multimodal columns (SURVEY N5): binary image ingest, perceptual hashing,
and the OCR UDF boundary with pluggable backends."""
