"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


def dataset_to_table(ds: rd.Dataset, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Collect a (small) Dataset into one Arrow table on the driver.

    Tolerates the zero-column blocks Ray emits for empty groupby/
    aggregate partitions (they would make ``pa.concat_tables`` throw a
    schema mismatch)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if not tables:
        return (empty_schema or pa.schema([])).empty_table()
    return pa.concat_tables(tables)
