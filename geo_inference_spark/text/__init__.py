"""Web-text payload operators: dedup, similarity, analysis, multimodal.

The training-data-pipeline half of the engine (documents / embeddings
tables). Where possible operators are expressed as portable SQL that
Spark SQL and DuckDB evaluate identically (portable.py), so the
driver's oracle gate checks them value-for-value.
"""
