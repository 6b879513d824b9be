"""wiki_references_db_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of internetarchive/wiki-references-db.

The reference system (see /root/reference, cited throughout as
``reference:<file>:<line>``) is a three-phase batch ETL pipeline
(extract -> dedup -> load) plus a Flask/Postgres query service over
Wikipedia citation history.  This package re-expresses the same data
model, operator semantics and query surface Spark-first:

- ``sources``    : .mwrev.zst revision-bundle reader, parquet staging IO
- ``functions``  : scalar derivations + the wikitext normalizer/extractor UDFs
- ``operators``  : generic relational operators (distinct-on, merge,
                   pagination, top-k) and the large-scale training-data
                   operator families (dedup, similarity search, text
                   analysis, multimodal plumbing)
- ``plans``      : staging projections, per-table dedup, warehouse build
                   (id assignment + FK resolution joins)
- ``queries``    : the serving-layer query surface (citation lifecycle et
                   al.) as pure (spark, tables) -> DataFrame functions
- ``streaming``  : Structured Streaming ingest of new revision bundles

Everything is built on the public PySpark DataFrame/SQL API; Catalyst and
Tungsten pick the physical plans.  No code is copied from the reference —
its behavior is reproduced from its observable semantics and golden tests.
"""

__version__ = "0.1.0"
