"""Beyond-reference operators: the LLM-training-data pipeline surface
(deduplication, similarity search, text analysis, multimodal columns, as-of
joins). Each module exposes a reusable DataFrame API plus QUERIES/ORACLE
registry entries."""
