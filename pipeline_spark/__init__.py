"""pipeline_spark — a PySpark-native, config-driven analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
mercari/pipeline (an Apache Beam based YAML/JSON pipeline tool), re-expressed
Spark-first: every module is a function ``(dict[str, DataFrame], params) ->
dict[str, DataFrame]``; filters/selects/aggregations compile to Catalyst
``Column`` expressions (never per-row Python in the hot path), so predicate
pushdown, column pruning, whole-stage codegen and AQE apply across the whole
config-declared DAG.

Reference semantics are documented per-module with ``file:line`` citations
into the reference repo (see SURVEY.md).
"""

from pipeline_spark.config import Config, load_config
from pipeline_spark.executor import PipelineExecutor, run_pipeline
from pipeline_spark.registry import module, get_module, registered_modules

__all__ = [
    "Config",
    "load_config",
    "PipelineExecutor",
    "run_pipeline",
    "module",
    "get_module",
    "registered_modules",
]

__version__ = "0.1.0"
