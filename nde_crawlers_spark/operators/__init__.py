"""DataFrame-native operators: seen-filter, frontier scheduling, fetch,
parse/normalize, dedup, similarity, merge, enrichment, wrapper passes."""
