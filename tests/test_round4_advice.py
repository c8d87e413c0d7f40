"""Round-4 ADVICE fixes: reader format guards, band-join timestamp
unit safety, simhash distributed fragment stitching."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_read_table_rejects_mixed_format_dir(tmp_path):
    from deduper_ray.sources.readers import read_table

    d = str(tmp_path / "mixed")
    os.makedirs(d)
    pq.write_table(pa.table({"a": [1]}), os.path.join(d, "x.parquet"))
    with open(os.path.join(d, "y.jsonl"), "w") as f:
        f.write('{"a": 2}\n')
    with pytest.raises(ValueError, match="mixes file formats"):
        read_table(d)


def test_jsonl_dir_expansion_skips_plain_json(tmp_path):
    from deduper_ray.sources.jsonl_io import _expand_jsonl_paths

    d = str(tmp_path / "j")
    os.makedirs(d)
    with open(os.path.join(d, "good.jsonl"), "w") as f:
        f.write('{"a": 1}\n')
    with open(os.path.join(d, "pretty.json"), "w") as f:
        f.write('{\n  "a": 2\n}\n')
    assert [os.path.basename(p) for p in _expand_jsonl_paths(d)] == [
        "good.jsonl"
    ]


def test_range_join_rejects_non_timestamp_ts():
    from deduper_ray.stages.relational import range_join_count

    points = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([10, 20], type=pa.int64()),  # epoch-seconds int
            }
        )
    )
    intervals = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "start": pa.array([5], type=pa.int64()),
                "iid": pa.array([1], type=pa.int64()),
            }
        )
    )
    out = range_join_count(
        points, intervals, by="k", point_ts="ts",
        interval_start="start", window_sec=30, interval_id="iid",
    )
    with pytest.raises(Exception, match="timestamp"):
        out.materialize()


def test_range_join_normalizes_mixed_timestamp_units():
    from deduper_ray.stages.relational import range_join_count

    base = 1_700_000_000  # epoch seconds
    points = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1], type=pa.int64()),
                "ts": pa.array(
                    [(base + s) * 1000 for s in (5, 25, 95)],
                    type=pa.timestamp("ms"),
                ),
            }
        )
    )
    intervals = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], type=pa.int64()),
                "start": pa.array(
                    [(base + 0) * 1_000_000], type=pa.timestamp("us")
                ),
                "iid": pa.array([7], type=pa.int64()),
            }
        )
    )
    out = range_join_count(
        points, intervals, by="k", point_ts="ts",
        interval_start="start", window_sec=60, interval_id="iid",
    ).to_pandas()
    # points at +5s and +25s fall in [0, 60); +95s does not
    assert out.loc[out["iid"] == 7, "n_points"].iloc[0] == 2


def test_simhash_distributed_fragment_stitch_matches_driver():
    from deduper_ray.stages.simhash_nd import simhash_neardup

    rng = np.random.default_rng(11)
    n = 3000
    base = rng.integers(0, 2**63, n // 3, dtype=np.int64)
    sims = np.concatenate([base, base, base])  # heavy identical groups
    # plus some 1-bit-flipped variants
    flipped = base[:200] ^ np.int64(1)
    sims = np.concatenate([sims, flipped])
    ids = np.arange(1, sims.size + 1, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "row_id": pa.array(ids),
                "simhash": pa.array(sims.view(np.uint64), type=pa.uint64()),
            }
        )
    ).repartition(8)
    kw = dict(id_column="row_id", sim_column="simhash", max_hamming=3)
    a = (
        simhash_neardup(ds, **kw)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    b = (
        simhash_neardup(ds, frag_driver_budget=0, **kw)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) >= 2 * (n // 3)  # the clone families must cluster
