"""Sources: deterministic synthetic seed lists, robots rules, fetch corpus."""
