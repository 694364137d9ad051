"""End-to-end Ray Data pipelines: the iterative crawl loop, reports,
dedup / similarity / text-analysis pipelines."""
