"""Operators: the engine's query surface, grouped by family.

- ``cardinality`` — the reference's [CORE] windowed distinct-count family
- ``relational``  — SURVEY.md §2.3 [EXT] relational operators (E1-E16)
- ``dedup``       — exact + near-duplicate detection (E20)
- ``similarity``  — embedding similarity search (E21)
- ``text``        — text analysis over documents (E22)
- ``multimodal``  — binary-column plumbing with stubbed decoders (E23)
"""
