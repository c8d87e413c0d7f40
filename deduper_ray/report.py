"""DedupeReport — the job summary (reference: Deduper.kt:42-60).

Field-for-field parity with the reference's report, computed from
distributed aggregates instead of single-thread counters:

  record_count        total rows scanned          (reference recordCount)
  hash_columns        columns hashed              (hashColumns)
  columns_found       source schema column names  (columnsFound)
  dupe_count          total duplicate rows        (dupeCount)
  distinct_dupe_count duplicated-hash group count (distinctDupeCount)
  hash_count          size of the seen-hash set AFTER the run — includes
                      preloaded hashes (reference: Deduper.kt:265-279,
                      preload-inclusive per DeduperTest.kt:408)
  dupes               {hash: {row_ids, first_found_row_number,
                      dupe_values_json}} (reference Dupe, Persistors.kt:20)
  success             job success flag
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class DupeGroup:
    """One duplicated-hash group (reference: Persistors.kt:20-27)."""

    row_ids: list[int]
    first_found_row_number: int
    dupe_values_json: str

    def to_row(self, hash_: str) -> dict[str, Any]:
        """Sink-row rendering (reference dupes DDL: Persistors.kt:343-351)."""
        return {
            "hash": hash_,
            "row_ids": json.dumps(self.row_ids),
            "first_found_row_number": self.first_found_row_number,
            "dupe_values": self.dupe_values_json,
        }


@dataclass
class DedupeReport:
    record_count: int
    hash_columns: list[str]
    columns_found: list[str]
    dupe_count: int
    distinct_dupe_count: int
    hash_count: int
    dupes: dict[str, DupeGroup] = field(default_factory=dict)
    success: bool = True

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=2, sort_keys=True)

    def __str__(self) -> str:  # reference toString: Deduper.kt:52-59
        return (
            f"DedupeReport(recordCount={self.record_count}, "
            f"hashColumns={self.hash_columns}, dupeCount={self.dupe_count}, "
            f"distinctDupeCount={self.distinct_dupe_count}, "
            f"hashCount={self.hash_count}, success={self.success})"
        )
