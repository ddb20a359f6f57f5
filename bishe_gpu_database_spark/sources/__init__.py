"""Source/sink connectors; importing registers the round-trip queries."""
