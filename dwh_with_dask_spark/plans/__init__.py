"""Query plans: the driver-facing query registry + the reference ETL pipelines.

``QUERIES`` maps query name → callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps the same names → ANSI SQL for the DuckDB oracle (absent
for non-SQL-expressible operators, which the driver checks rows-only).
"""

from dwh_with_dask_spark.plans.relational import ORACLES as _REL_ORACLES
from dwh_with_dask_spark.plans.relational import QUERIES as _REL_QUERIES
from dwh_with_dask_spark.plans.llm import ORACLES as _LLM_ORACLES
from dwh_with_dask_spark.plans.llm import QUERIES as _LLM_QUERIES
from dwh_with_dask_spark.plans.curation import ORACLES as _CUR_ORACLES
from dwh_with_dask_spark.plans.curation import QUERIES as _CUR_QUERIES
from dwh_with_dask_spark.plans.tpch_extra import ORACLES as _TPCH_ORACLES
from dwh_with_dask_spark.plans.tpch_extra import QUERIES as _TPCH_QUERIES
from dwh_with_dask_spark.plans.warehouse import ORACLES as _WH_ORACLES
from dwh_with_dask_spark.plans.warehouse import QUERIES as _WH_QUERIES
from dwh_with_dask_spark.plans.analytics import ORACLES as _AN_ORACLES
from dwh_with_dask_spark.plans.analytics import QUERIES as _AN_QUERIES
from dwh_with_dask_spark.plans.etl_driver import ORACLES as _ETL_ORACLES
from dwh_with_dask_spark.plans.etl_driver import QUERIES as _ETL_QUERIES

QUERIES = {
    **_REL_QUERIES,
    **_LLM_QUERIES,
    **_CUR_QUERIES,
    **_TPCH_QUERIES,
    **_WH_QUERIES,
    **_AN_QUERIES,
    **_ETL_QUERIES,
}
ORACLES = {
    **_REL_ORACLES,
    **_LLM_ORACLES,
    **_CUR_ORACLES,
    **_TPCH_ORACLES,
    **_WH_ORACLES,
    **_AN_ORACLES,
    **_ETL_ORACLES,
}

__all__ = ["QUERIES", "ORACLES"]
