"""Incremental near-dup (pipelines/incremental.py): decisions for a
new-doc batch equal what a FULL run over prior ∪ new would decide."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from deduper_ray.config import NearDupConfig
from deduper_ray.pipelines.incremental import run_neardup_incremental
from deduper_ray.pipelines.neardup import run_neardup
from tests.fixtures import make_code_files


def _cfg():
    return NearDupConfig(
        text_column="content", shingle_k=8, num_perms=64, bands=16,
        threshold=0.65, batch_size=256, simhash_bits=0,
    )


def test_incremental_matches_full_run(tmp_path):
    src_a = str(tmp_path / "a.parquet")
    make_code_files(src_a, n_rows=700, seed=23)
    a = pq.read_table(src_a)

    # B: 60 verbatim clones of A docs, 40 internal clone pairs (20×2),
    # 100 fresh docs (from a different seed region)
    rng = np.random.RandomState(7)
    a_texts = a["content"].to_pylist()
    clones_of_a = [a_texts[i] for i in rng.choice(len(a_texts), 60, replace=False)]
    fresh_src = str(tmp_path / "fresh.parquet")
    make_code_files(fresh_src, n_rows=120, seed=911)
    fresh = pq.read_table(fresh_src)["content"].to_pylist()
    internal = [fresh[100 + i // 2] for i in range(40)]  # 20 texts × 2
    b_texts = clones_of_a + internal + fresh[:100]
    src_b = str(tmp_path / "b.parquet")
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array(range(len(b_texts)), type=pa.int64()),
                "content": b_texts,
            }
        ),
        src_b,
    )

    cfg = _cfg()
    prior = run_neardup(src_a, str(tmp_path / "prior"), cfg, resume=False)
    inc = run_neardup_incremental(
        src_b, str(tmp_path / "inc"), cfg,
        prior_signatures=str(tmp_path / "prior" / "signatures"),
    )
    dec = inc.decisions().to_pandas().sort_values("row_id")
    assert len(dec) == len(b_texts)
    assert inc.n_dup_of_prior >= 55  # ~all 60 verbatim clones of A

    # oracle: full run over A ∪ B (B ids shifted above A's)
    n_a = a.num_rows
    union = pa.table(
        {
            "row_id": pa.array(
                list(range(n_a)) + [n_a + i for i in range(len(b_texts))],
                type=pa.int64(),
            ),
            "content": a_texts + b_texts,
        }
    )
    src_u = str(tmp_path / "u.parquet")
    pq.write_table(union, src_u)
    full = run_neardup(src_u, str(tmp_path / "full"), cfg, resume=False)
    cl = full.clusters().to_pandas()
    drop_union = set(
        int(r) for r, c in zip(cl["row_id"], cl["cluster_id"]) if r != c
    )
    expected_keep = {
        i: (n_a + i) not in drop_union for i in range(len(b_texts))
    }
    got_keep = dict(zip(dec["row_id"].astype(int), dec["keep"]))
    diffs = {
        i for i in expected_keep if bool(expected_keep[i]) != bool(got_keep[i])
    }
    assert not diffs, f"{len(diffs)} decision mismatches: {sorted(diffs)[:10]}"
