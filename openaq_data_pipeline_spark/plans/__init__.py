"""Driver-side plans: the batch runner (replaces Airflow DAG logic),
the incremental high-watermark MERGE sink, and the data-quality test
executor (replaces `dbt build`'s model+test interleave)."""
