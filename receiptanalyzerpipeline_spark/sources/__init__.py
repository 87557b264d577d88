"""Sources: Textract-JSON documents, binary image files, streaming ingest."""
