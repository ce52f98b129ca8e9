"""Training-data pipeline operators beyond the reference's encoding
surface: deduplication, text analysis, similarity search, multimodal
plumbing — first-class components for the 100 TB pipeline (task brief),
each expressed as Ray Data batch transforms."""
