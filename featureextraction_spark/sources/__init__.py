"""Sources & ingest plumbing (binary/multimodal columns, fixtures)."""
