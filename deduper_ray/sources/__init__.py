from deduper_ray.sources.readers import read_parquet_with_row_ids, read_table

__all__ = ["read_parquet_with_row_ids", "read_table"]
