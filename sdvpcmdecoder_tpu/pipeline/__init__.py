"""Host orchestration: ingest, V2D driver, stitchers, audio chain, WAV."""
