"""PySpark-native analytics engine with the capabilities of the reference
``longNguyen010203/Finance-Data-Ingestion-Pipeline-with-Kafka`` pipeline, rebuilt Spark-first.

Layers (see SURVEY.md):

* **Faithful core** — the reference's actual streaming surface: Kafka-shaped
  JSON source, schema-applied decode, projection/rename/cast, surrogate keys,
  validity predicates, stateful dedup, idempotent sinks
  (``streaming/``, ``schemas.py``).
* **Declared analytics surface** — the batch/streaming relational operators
  the reference promises (joins, aggregations, window functions, set ops,
  sorts), registered as oracle-checked queries (``operators/``).
* **Extension surface** — large-scale training-data pipeline operators:
  dedup (exact/MinHash/SimHash), similarity search, text analysis,
  multimodal binary columns (``operators/dedup.py`` etc.).

Everything is DataFrame/SQL-declarative so Catalyst owns the physical plan;
no RDDs, no driver-side loops over data.
"""

__version__ = "0.1.0"
