"""Config presets, stats aggregation, checkpoint/resume."""
