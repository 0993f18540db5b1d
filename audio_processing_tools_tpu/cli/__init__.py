"""Command-line tools (header/audio parser CLIs + fleet backfill)."""
