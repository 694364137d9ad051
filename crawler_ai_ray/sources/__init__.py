"""Sources: the deterministic synthetic Common-Crawl-style corpus and
readers for the driver-provided TPC-H-ish test tables."""
