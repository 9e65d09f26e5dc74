"""Table IO + external-format sources."""
