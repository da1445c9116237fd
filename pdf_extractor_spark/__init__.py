"""pdf_extractor_spark — a PySpark-native transcript/main-content extraction engine.

A from-scratch re-expression of glindberg2000/PDF-extractor's
parse -> normalize -> validate -> consolidate pipeline (see SURVEY.md) as
stateless, vectorized Spark transforms over an Iceberg-style transcript table
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  rules/      pure-Python rule library (reference semantics; shared by the
              golden oracle and the Arrow/pandas UDF tier — byte parity by
              construction)
  operators/  Spark DataFrame operators (extraction, ordering/salting,
              quarantine, dedup, similarity, text stats, fuzzy join)
  sources/    readers + deterministic synthetic transcript generator
  functions/  native Column-expression helpers (JVM-side fast path)
  plans/      end-to-end pipeline driver + lineage/checkpoint writer
  streaming/  Structured Streaming variant of the extraction pipeline
"""

__version__ = "0.1.0"
