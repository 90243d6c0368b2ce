"""Sources & sinks: the lake ⇄ bronze boundary (SURVEY §2.1).

The reference's lake is Hive-style ``YYYY/MM/DD``-partitioned NDJSON
chunks on GCS (``scripts/gcs_utils.py:47-87``); bronze is day-
partitioned tables loaded append-mode with fixed schemas
(``dags/01_openaq_ingestion.py:121-201``). Here the lake is any
path Spark can glob (NDJSON kept for parity, Parquet preferred) and
bronze is date-partitioned Parquet written with dynamic partition
overwrite — the idempotent-replay equivalent of the reference's
delete-before-write (``gcs_utils.py:26-44``).
"""

from openaq_data_pipeline_spark.sources.lake import (
    read_control_csv,
    read_ndjson,
    write_ndjson,
)
from openaq_data_pipeline_spark.sources.bronze import (
    load_bronze,
    recover_bronze,
    write_bronze,
)

__all__ = [
    "read_ndjson",
    "read_control_csv",
    "write_ndjson",
    "write_bronze",
    "load_bronze",
    "recover_bronze",
]
