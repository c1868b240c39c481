"""[EXT] data-pipeline query registrations (dedup/similarity/text) — build step 4."""
