"""etl_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
``fmWaithaka/Etl_data_pipeline`` (a config-driven incremental batch ETL
copier: MySQL -> PostgreSQL with per-table watermark state, parallel
per-table execution, append-only batched inserts — see SURVEY.md) as an
idiomatic Spark engine:

- declarative ``TableSpec`` registry (reference ``tables_list`` CSV,
  util.py:352-400)
- pluggable Source/Sink format registries (reference connector
  factories, util.py:276-335)
- engine-owned watermark store with the reference's exact degrade
  semantics (app.py:96-132)
- per-table parallel pipeline runner with error isolation
  (app.py:88-177, dags/data_pipeline_with_incremental.py:89-187)
- plus the full relational / streaming / LLM-data-pipeline operator
  surface declared in SURVEY.md §2.B, designed for 100 TB scale.
"""

__version__ = "0.1.0"

from etl_data_pipeline_spark.session import get_spark, load_table  # noqa: F401
from etl_data_pipeline_spark.spec import TableSpec, PipelineSpec, read_table_registry  # noqa: F401
from etl_data_pipeline_spark.watermark import WatermarkStore  # noqa: F401
from etl_data_pipeline_spark.pipeline import IncrementalPipeline, TableRunResult  # noqa: F401
