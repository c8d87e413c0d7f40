"""The flagship exact-dedup job — Ray-Data re-architecture of
``Deduper.dedupe()`` (reference: Deduper.kt:429-549).

Reference lifecycle (1 producer thread + ≤3 sink consumer threads over
bounded queues with empty-list EOS sentinels) becomes a lazy Dataset
DAG executed by the streaming executor: queues/sentinels/backpressure
are the executor's job, sink threads become ``write_parquet`` branches,
and the in-heap seenHashes/dupeMap state becomes one narrow
groupby-aggregate shuffle (see stages/exact.py for the decomposition).

Outputs (all optional, mirroring the reference's three sinks):
  target_path/  deduped rows, input schema (+row_id)      (K1/K2)
  dupes_path/   (hash, row_ids json, first_found_row_number,
                dupe_values json)                          (K3)
  hashes_path/  (hash [, json_row])                        (K4)
plus a DedupeReport (O10) and hard-fail count reconciliation (K5 —
the reference only logs mismatches, BaseConsumer.kt:106-117; we raise).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from deduper_ray.config import DedupeConfig
from deduper_ray.functions.hashing import add_hash_columns, md5_hex_array, stringify_columns
from deduper_ray.report import DedupeReport, DupeGroup
from deduper_ray.sources.readers import read_table
from deduper_ray.stages.exact import (
    HASH_COL,
    ROW_ID,
    drop_row_ids,
    dupe_group_details,
    group_stats,
    make_drop_filter,
)
from deduper_ray.stages.seen import SEEN_FLAG, SeenHashMarker, load_seen_hashes, mark_not_seen


def build_hashed_dataset(cfg: DedupeConfig) -> tuple[rd.Dataset, list[str]]:
    """read → row_id → row_md5 → is_seen. Returns (dataset, source columns)."""
    ds = read_table(cfg.source, columns=list(cfg.columns) if cfg.columns else None,
                    order_by=cfg.order_by)
    schema_cols = [c for c in ds.schema().names if c != ROW_ID]
    hash_keys = cfg.hash_keys or tuple(schema_cols)
    missing = [k for k in hash_keys if k not in schema_cols]
    if missing:  # reference: require(...) Deduper.kt:177-179
        raise ValueError(f"hash columns {missing} not in source columns {schema_cols}")

    ds = ds.map_batches(
        lambda t: add_hash_columns(t, hash_keys, hash_col=HASH_COL),
        batch_format="pyarrow",
    )
    if cfg.seen_hashes:
        from deduper_ray.sources.sql_io import (
            is_sqlite_url,
            load_seen_hashes_sqlite,
        )

        if is_sqlite_url(cfg.seen_hashes):
            seen_ref = load_seen_hashes_sqlite(
                cfg.seen_hashes, cfg.seen_hash_column
            )
        else:
            seen_ref = load_seen_hashes(cfg.seen_hashes, cfg.seen_hash_column)
        ds = ds.map_batches(
            SeenHashMarker,
            fn_constructor_kwargs={"seen_ref": seen_ref, "hash_col": HASH_COL},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    else:
        ds = ds.map_batches(mark_not_seen, batch_format="pyarrow")
    return ds, schema_cols


def _count_seen_hashes(cfg: DedupeConfig) -> int:
    if not cfg.seen_hashes:
        return 0
    import pyarrow.parquet as pq

    from deduper_ray.sources.readers import _expand_paths
    from deduper_ray.sources.sql_io import is_sqlite_url

    if is_sqlite_url(cfg.seen_hashes):
        import ray as _ray

        from deduper_ray.sources.sql_io import load_seen_hashes_sqlite

        return len(
            _ray.get(
                load_seen_hashes_sqlite(cfg.seen_hashes, cfg.seen_hash_column)
            )
        )
    tables = [
        pq.read_table(f, columns=[cfg.seen_hash_column])
        for f in _expand_paths(cfg.seen_hashes)
    ]
    return len(pc.unique(pa.concat_tables(tables)[cfg.seen_hash_column]))


def dedupe(cfg: DedupeConfig, *, materialize: bool = True) -> DedupeReport:
    """Run the full job; returns the report (reference: Deduper.kt:429).

    ``materialize=True`` pins the hashed dataset (and the per-hash
    stats) in the object store so the multiple consumers below (stats,
    dupe details, target, hashes) don't re-run the read+MD5 DAG per
    sink. At 100 TB, replace with a parquet stage checkpoint
    (state/lineage.py) — same idea, disk-backed; the object store
    spills to disk under memory pressure either way.
    """
    import time

    t_start = time.time()

    def _check_timeout(stage: str) -> None:
        # reference ExecutionServiceTimeout (Deduper.kt:534-544):
        # job-level wall budget, checked at stage boundaries
        if (
            cfg.execution_timeout_sec is not None
            and time.time() - t_start > cfg.execution_timeout_sec
        ):
            raise TimeoutError(
                f"dedupe exceeded execution_timeout_sec="
                f"{cfg.execution_timeout_sec} before stage {stage!r}"
            )

    if cfg.dupes_detail not in ("full", "summary", "distributed"):
        raise ValueError(
            f"unknown dupes_detail {cfg.dupes_detail!r}; expected "
            "'full', 'summary' or 'distributed'"
        )
    if (
        cfg.dupes_detail in ("summary", "distributed")
        and cfg.hashes_path
        and cfg.include_json
    ):
        # same upfront guard as the target sink: summary/distributed
        # modes have no driver drop-set, so the include_json hashes
        # sink would write every row and only fail at K5 reconciliation
        raise ValueError(
            f"dupes_detail={cfg.dupes_detail!r} skips the driver "
            "drop-set; hashes_path with include_json=True requires "
            "dupes_detail='full'"
        )
    hashed, schema_cols = build_hashed_dataset(cfg)
    hash_keys = list(cfg.hash_keys or schema_cols)
    if materialize:
        hashed = hashed.materialize()

    stats = group_stats(hashed).materialize()

    # -- driver-side scalar aggregates (reference O10 counters): one
    #    summary row per stats batch, summed on the driver ------------
    def _summary(t: pa.Table) -> pa.Table:
        seen = pc.greater(t["any_seen"], 0)
        multi = pc.greater(t["n_rows"], 1)

        def s(arr):
            return pc.sum(pc.cast(arr, pa.int64())).as_py() or 0

        return pa.table(
            {
                "groups": pa.array([t.num_rows], type=pa.int64()),
                "rows": pa.array([pc.sum(t["n_rows"]).as_py() or 0], type=pa.int64()),
                "seen_groups": pa.array([s(seen)], type=pa.int64()),
                "seen_rows": pa.array(
                    [pc.sum(pc.multiply(pc.cast(seen, pa.int64()), t["n_rows"])).as_py() or 0],
                    type=pa.int64(),
                ),
                "multi_groups": pa.array([s(multi)], type=pa.int64()),
                "seen_multi": pa.array([s(pc.and_(seen, multi))], type=pa.int64()),
            }
        )

    _sums = stats.map_batches(_summary, batch_format="pyarrow").to_pandas()
    if len(_sums) == 0 or "rows" not in _sums.columns:
        # empty source: no stats blocks at all
        agg = pd.Series(
            {
                "groups": 0, "rows": 0, "seen_groups": 0,
                "seen_rows": 0, "multi_groups": 0, "seen_multi": 0,
            }
        )
    else:
        agg = _sums.sum()

    record_count = int(agg["rows"])
    unseen_groups = int(agg["groups"] - agg["seen_groups"])
    # dupes: every row of a preloaded-hash group + all-but-first of
    # multi-row unseen groups (reference Deduper.kt:207-240)
    dupe_count = int(agg["seen_rows"]) + (
        record_count - int(agg["seen_rows"]) - unseen_groups
    )
    distinct_dupe_count = int(
        agg["seen_groups"] + agg["multi_groups"] - agg["seen_multi"]
    )
    n_preloaded = _count_seen_hashes(cfg)
    hash_count = unseen_groups + n_preloaded  # preload-inclusive, DeduperTest.kt:408

    # -- dupe groups (bounded by dupe volume, like reference dupeMap).
    #    dupes_detail="summary" / "distributed" keep everything
    #    distributed instead (empty report.dupes; summary writes a
    #    stats-derived sink, distributed writes the full dupe-group
    #    rows as a Dataset — see sink below) --------------------------
    if cfg.dupes_detail in ("summary", "distributed"):
        dupes_df = pd.DataFrame(
            {
                "hash": pd.Series([], dtype=str),
                "row_ids": pd.Series([], dtype=object),
                "first_found_row_number": pd.Series([], dtype=np.int64),
                "dupe_values": pd.Series([], dtype=str),
            }
        )
        if cfg.target_path and cfg.dedupe_strategy != "shuffle":
            raise ValueError(
                f"dupes_detail={cfg.dupes_detail!r} skips the driver "
                "drop-set; use dedupe_strategy='shuffle' for the "
                "target sink"
            )
    else:
        dupes_df = dupe_group_details(
            hashed, stats, columns_for_json=schema_cols
        )

    report = DedupeReport(
        record_count=record_count,
        hash_columns=hash_keys,
        columns_found=schema_cols,
        dupe_count=dupe_count,
        distinct_dupe_count=distinct_dupe_count,
        hash_count=hash_count,
        dupes={
            r["hash"]: DupeGroup(
                row_ids=list(r["row_ids"]),
                first_found_row_number=int(r["first_found_row_number"]),
                dupe_values_json=r["dupe_values"],
            )
            for _, r in dupes_df.iterrows()
        },
        success=True,
    )

    # -- sinks ---------------------------------------------------------
    from deduper_ray.sources.sql_io import (
        is_sqlite_url,
        parse_sqlite_url,
        write_sqlite_dupes,
        write_sqlite_hashes,
        write_sqlite_table,
    )

    import contextlib
    import logging

    logger = logging.getLogger(__name__)
    failed_sinks: list[str] = []

    @contextlib.contextmanager
    def _sink_guard(name: str):
        # fail_soft=True: reference behavior — a dead sink is logged
        # and the job keeps success=True (DeduperTest.kt:482-497);
        # default False hard-fails (deliberate improvement)
        try:
            yield
        except Exception:
            if not cfg.fail_soft:
                raise
            failed_sinks.append(name)
            logger.exception("sink %r failed (fail_soft=True)", name)

    written = {}
    _check_timeout("target sink")
    if cfg.target_path:
        if not is_sqlite_url(cfg.target_path):
            os.makedirs(cfg.target_path, exist_ok=True)
        if cfg.dedupe_strategy == "shuffle":
            # dupe-heavy path: grouped first-wins over full rows — no
            # driver-resident drop set (stages/exact.py dedupe_shuffle)
            from deduper_ray.stages.exact import dedupe_shuffle

            target = dedupe_shuffle(hashed).map_batches(
                lambda t: t.drop_columns([HASH_COL, SEEN_FLAG]),
                batch_format="pyarrow",
            )
        else:
            drops_ref = ray.put(drop_row_ids(dupes_df))
            # task-pool filter (stages/exact.py make_drop_filter): fuses
            # anti-filter + projection + Write into one stage with no
            # actor-startup latency on the critical path
            target = hashed.map_batches(
                make_drop_filter(drops_ref, drop_cols=[HASH_COL, SEEN_FLAG]),
                batch_format="pyarrow",
            )
        with _sink_guard("target"):
            if is_sqlite_url(cfg.target_path):
                from deduper_ray.sources.sql_io import (
                    is_sharded_sqlite_url,
                    write_sqlite_sharded,
                )

                db, table, _ = parse_sqlite_url(cfg.target_path)
                if is_sharded_sqlite_url(cfg.target_path):
                    # parallel fan-out: sqlite:///dir/part-{i}.db —
                    # one database per shard, written concurrently
                    # (sql_io.write_sqlite_sharded); row counts still
                    # reconcile at K5
                    shard_dir = os.path.dirname(db)
                    written["target"] = write_sqlite_sharded(
                        target, shard_dir, table or "target_data"
                    )
                else:
                    # reference K2 SQL target (Persistors.kt:240-314):
                    # auto-DDL + batched INSERT into the named table
                    written["target"] = write_sqlite_table(
                        target, db, table or "target_data"
                    )
            elif cfg.target_format == "csv":
                # reference K1 CSV target (Persistors.kt:147-179)
                from deduper_ray.sources.csv_io import write_csv_sink

                write_csv_sink(
                    target, cfg.target_path,
                    delimiter=cfg.csv_delimiter,
                    extension=cfg.csv_extension,
                )
                written["target"] = _count_csv(
                    cfg.target_path, cfg.csv_delimiter
                )
            else:
                target.write_parquet(cfg.target_path)
                written["target"] = _count_parquet(cfg.target_path)

    _check_timeout("dupes sink")
    if cfg.dupes_path:
        if not is_sqlite_url(cfg.dupes_path):
            os.makedirs(cfg.dupes_path, exist_ok=True)
        if cfg.dupes_detail == "summary":
            # distributed: one row per duplicated hash straight from the
            # per-hash stats — no member lists, no driver residency
            def _dupe_summary(t: pa.Table) -> pa.Table:
                dup = t.filter(
                    pc.or_(
                        pc.greater(t["n_rows"], 1),
                        pc.greater(t["any_seen"], 0),
                    )
                )
                seen = pc.greater(dup["any_seen"], 0)
                first = pc.if_else(
                    seen, pa.scalar(0, pa.int64()), dup["first_row_id"]
                )
                n_dupes = pc.subtract(
                    dup["n_rows"],
                    pc.cast(pc.equal(dup["any_seen"], 0), pa.int64()),
                )
                return pa.table(
                    {
                        "hash": dup[HASH_COL],
                        "first_found_row_number": first,
                        "dupe_count": n_dupes,
                    }
                )

            summary_ds = stats.map_batches(
                _dupe_summary, batch_format="pyarrow"
            )
            with _sink_guard("dupes"):
                if is_sqlite_url(cfg.dupes_path):
                    db, table, _ = parse_sqlite_url(cfg.dupes_path)
                    written["dupes"] = write_sqlite_table(
                        summary_ds, db, table or "dupes",
                        primary_key="hash",
                    )
                elif cfg.target_format == "csv":
                    from deduper_ray.sources.csv_io import write_csv_sink

                    write_csv_sink(
                        summary_ds, cfg.dupes_path,
                        delimiter=cfg.csv_delimiter,
                        extension=cfg.csv_extension,
                    )
                    written["dupes"] = _count_csv(
                        cfg.dupes_path, cfg.csv_delimiter
                    )
                else:
                    summary_ds.write_parquet(cfg.dupes_path)
                    written["dupes"] = _count_parquet(cfg.dupes_path)
        elif cfg.dupes_detail == "distributed":
            # full dupe-group rows (reference K3 schema: hash, row_ids
            # json, first_found_row_number, dupe_values) assembled and
            # written entirely distributed — nothing dupe-sized on the
            # driver (stages/exact.py dupe_groups_ds)
            from deduper_ray.stages.exact import dupe_groups_ds

            groups_sink = dupe_groups_ds(
                hashed, stats, columns_for_json=schema_cols
            )
            with _sink_guard("dupes"):
                if is_sqlite_url(cfg.dupes_path):
                    db, table, _ = parse_sqlite_url(cfg.dupes_path)
                    written["dupes"] = write_sqlite_table(
                        groups_sink, db, table or "dupes",
                        primary_key="hash",
                    )
                elif cfg.target_format == "csv":
                    from deduper_ray.sources.csv_io import write_csv_sink

                    write_csv_sink(
                        groups_sink, cfg.dupes_path,
                        delimiter=cfg.csv_delimiter,
                        extension=cfg.csv_extension,
                    )
                    written["dupes"] = _count_csv(
                        cfg.dupes_path, cfg.csv_delimiter
                    )
                else:
                    groups_sink.write_parquet(cfg.dupes_path)
                    written["dupes"] = _count_parquet(cfg.dupes_path)
        else:
            dupes_sink = pa.table(
                {
                    "hash": pa.array(dupes_df["hash"], type=pa.string()),
                    "row_ids": pa.array(
                        [json.dumps(ids) for ids in dupes_df["row_ids"]],
                        type=pa.string(),
                    ),
                    "first_found_row_number": pa.array(
                        dupes_df["first_found_row_number"], type=pa.int64()
                    ),
                    "dupe_values": pa.array(
                        dupes_df["dupe_values"], type=pa.string()
                    ),
                }
            )
            with _sink_guard("dupes"):
                if is_sqlite_url(cfg.dupes_path):
                    # reference K3 SQL dupes (Persistors.kt:325-385):
                    # fixed schema (hash PK, row_ids json, first_found,
                    # values)
                    db, _, _ = parse_sqlite_url(cfg.dupes_path)
                    written["dupes"] = write_sqlite_dupes(dupes_sink, db)
                elif cfg.target_format == "csv":
                    # reference CsvDupePersistor (Persistors.kt:183-210)
                    import pyarrow.csv as pacsv

                    pacsv.write_csv(
                        dupes_sink,
                        os.path.join(
                            cfg.dupes_path, f"dupes.{cfg.csv_extension}"
                        ),
                        write_options=pacsv.WriteOptions(
                            delimiter=cfg.csv_delimiter
                        ),
                    )
                    written["dupes"] = dupes_sink.num_rows
                else:
                    import pyarrow.parquet as pq

                    pq.write_table(
                        dupes_sink,
                        os.path.join(cfg.dupes_path, "dupes.parquet"),
                    )
                    written["dupes"] = dupes_sink.num_rows

    _check_timeout("hashes sink")
    if cfg.hashes_path:
        # newly-seen hashes; with include_json the keeper row rides along
        # (reference hash sink: Persistors.kt:391-453). Reusable as the
        # next run's seen_hashes input (incremental mode, SURVEY §2 S3).
        if cfg.include_json:
            drops_ref = ray.put(drop_row_ids(dupes_df))
            cols = schema_cols

            def _hash_rows(t: pa.Table) -> pa.Table:
                payload = [
                    json.dumps({c: rec[c] for c in cols}, default=str, ensure_ascii=False)
                    for rec in t.select(cols).to_pylist()
                ]
                return pa.table(
                    {
                        "hash": t[HASH_COL],
                        "json_row": pa.array(payload, type=pa.string()),
                    }
                )

            hashes_ds = hashed.map_batches(
                make_drop_filter(drops_ref), batch_format="pyarrow"
            ).map_batches(_hash_rows, batch_format="pyarrow")
        else:
            hashes_ds = stats.map_batches(
                lambda t: pa.table(
                    {
                        "hash": t.filter(pc.equal(t["any_seen"], 0))[HASH_COL],
                        "json_row": pa.nulls(
                            t.filter(pc.equal(t["any_seen"], 0)).num_rows,
                            type=pa.string(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        with _sink_guard("hashes"):
            if is_sqlite_url(cfg.hashes_path):
                # reference K4 SQL hashes (Persistors.kt:391-453)
                db, _, _ = parse_sqlite_url(cfg.hashes_path)
                written["hashes"] = write_sqlite_hashes(hashes_ds, db)
            elif cfg.target_format == "csv":
                # reference CsvHashPersistor (Persistors.kt:212-233)
                from deduper_ray.sources.csv_io import write_csv_sink

                os.makedirs(cfg.hashes_path, exist_ok=True)
                write_csv_sink(
                    hashes_ds, cfg.hashes_path,
                    delimiter=cfg.csv_delimiter,
                    extension=cfg.csv_extension,
                )
                written["hashes"] = _count_csv(
                    cfg.hashes_path, cfg.csv_delimiter
                )
            else:
                os.makedirs(cfg.hashes_path, exist_ok=True)
                hashes_ds.write_parquet(cfg.hashes_path)
                written["hashes"] = _count_parquet(cfg.hashes_path)

    _check_timeout("reconciliation")
    # -- K5 reconciliation: hard-fail (reference only logs,
    #    BaseConsumer.kt:106-117; fail_soft downgrades to the
    #    reference's log-only behavior) -------------------------------
    expected = {
        "target": record_count - dupe_count,
        "dupes": distinct_dupe_count,
        "hashes": unseen_groups,
    }
    for sink, n in written.items():
        if n != expected[sink]:
            msg = f"sink '{sink}' wrote {n} rows, expected {expected[sink]}"
            if cfg.fail_soft:
                logger.warning(msg)
            else:
                raise RuntimeError(msg)
    return report


def _count_csv(path: str, delimiter: str) -> int:
    import pyarrow.csv as pacsv

    total = 0
    for f in os.listdir(path):
        full = os.path.join(path, f)
        if os.path.isfile(full) and not f.startswith("_"):
            total += pacsv.read_csv(
                full, parse_options=pacsv.ParseOptions(delimiter=delimiter)
            ).num_rows
    return total


def _count_parquet(path: str) -> int:
    import pyarrow.parquet as pq

    from deduper_ray.sources.readers import _expand_paths

    return sum(
        pq.ParquetFile(f).metadata.num_rows for f in _expand_paths(path)
    )


def sample_hash(cfg: DedupeConfig) -> tuple[str, str]:
    """First-row probe (reference S4: Deduper.getSampleHash,
    Deduper.kt:407-421): returns (sample_string, sample_hash)."""
    ds = read_table(cfg.source, columns=list(cfg.columns) if cfg.columns else None,
                    order_by=cfg.order_by)
    schema_cols = [c for c in ds.schema().names if c != ROW_ID]
    hash_keys = cfg.hash_keys or tuple(schema_cols)
    from deduper_ray.functions.util import dataset_to_table

    tbl = dataset_to_table(ds.sort(ROW_ID).limit(1))
    joined = stringify_columns(tbl, tuple(hash_keys))
    return joined[0].as_py(), md5_hex_array(joined)[0].as_py()
