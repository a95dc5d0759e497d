"""Sources: table readers + the deterministic synthetic web corpus."""
