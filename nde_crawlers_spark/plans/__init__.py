"""End-to-end plans: the checkpointed crawl loop and its Python oracle."""
