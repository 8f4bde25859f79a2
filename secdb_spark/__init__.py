"""secdb_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
(altova/SECDB: SQL-over-SQLite financial-fact database + Python ETL;
reference mount was empty at survey time, see SURVEY.md §0 — the product
spec is SURVEY.md §2's operator inventory) as idiomatic Spark DataFrame /
SQL plans, plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale training-data
work.

Layout:
    session.py    SparkSession factory with the proven configs
    catalog.py    explicit-schema table loaders (10 testdata tables)
    registry.py   operator registry: name -> (spark_fn, oracle_sql)
    engine.py     user facade: Engine(sf_dir).sql/.table/.op/.explain
    api.py        composable DataFrame API for arbitrary tables
                  (near_dup_pairs, sessionize, asof_join, the
                  bucketed global-order kernels, ...)
    __main__.py   one-shot CLI: python -m secdb_spark "SELECT ..."
    layout.py     partitioned/bucketed lakehouse write helpers
    operators/    operator implementations by family (SURVEY §2.A-§2.N)
"""

__version__ = "0.1.0"
