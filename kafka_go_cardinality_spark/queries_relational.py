"""[EXT] relational query registrations — populated in build step 3."""
