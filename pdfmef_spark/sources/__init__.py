"""Sources: table readers and the materialized corpus cache."""
