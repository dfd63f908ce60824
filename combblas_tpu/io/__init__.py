"""Matrix / vector I/O — Matrix Market and binary formats."""
