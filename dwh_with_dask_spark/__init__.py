"""dwh_with_dask_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the capability surface of
``DanendraPradnya/dwh-with-dask`` (see SURVEY.md), expressed Spark-first:
DataFrame/SQL declarative plans optimized by Catalyst, Pandas UDFs only
where built-ins genuinely cannot express the semantics, and Structured
Streaming for stream inputs.

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    catalog     test-table loading / temp-view registration
    functions/  scalar Column-expression library (text, dates, numbers)
    operators/  composed relational + LLM-pipeline operators
                (ids, asof/range joins, dedup, similarity, textstats,
                 sessionize, multimodal)
    sources/    readers (parquet/csv/json, Excel bridge, PDF/binary)
    sinks       writers (parquet/csv/json/jdbc helpers)
    plans/      the reference's three ETL pipelines re-expressed on Spark
    streaming/  Structured Streaming helpers (windows, watermark, sinks)
"""

from dwh_with_dask_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
