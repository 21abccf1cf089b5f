"""Sources / sinks: loaders, reshapers, registries, state round-trips
(SURVEY.md §2.1)."""
