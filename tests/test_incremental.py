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


def test_sign_corpus_resumable_crash_resume(tmp_path, monkeypatch):
    """r3: partition-level resume — a signing run that dies mid-stage
    re-runs ONLY missing shards and its output equals single-shot
    signing."""
    import os

    import deduper_ray.state.lineage as lin
    from deduper_ray.pipelines.incremental import (
        sign_corpus,
        sign_corpus_resumable,
    )

    src = str(tmp_path / "c.parquet")
    make_code_files(src, n_rows=1200, seed=31)
    cfg = _cfg()
    stage = str(tmp_path / "sigs_resumable")

    # first attempt: deterministically fail every shard whose first
    # row offset is >= 400 (shards are (path, row_group, offset)
    # lists), independent of worker scheduling
    orig = lin.partitioned_map_stage

    def _poisoned(items, task_fn, *a, **kw):
        def _wrapped(item):
            if item[0][2] >= 400:
                raise RuntimeError("injected crash")
            return task_fn(item)

        return orig(items, _wrapped, *a, **kw)

    monkeypatch.setattr(lin, "partitioned_map_stage", _poisoned)
    import deduper_ray.pipelines.incremental as inc_mod

    monkeypatch.setattr(
        inc_mod, "partitioned_map_stage", _poisoned, raising=False
    )
    try:
        sign_corpus_resumable(src, stage, cfg, rows_per_shard=200)
    except Exception:
        pass
    done_before = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    assert 1 <= len(done_before) < 6  # partial progress survived

    # resume with the healthy implementation
    monkeypatch.setattr(lin, "partitioned_map_stage", orig)
    monkeypatch.setattr(
        inc_mod, "partitioned_map_stage", orig, raising=False
    )
    resumed = sign_corpus_resumable(src, stage, cfg, rows_per_shard=200)
    import json

    with open(os.path.join(stage, "_lineage.json")) as f:
        lineage = json.load(f)
    assert lineage["complete"] and lineage["resumed_partitions"] >= 1

    single = sign_corpus(src, str(tmp_path / "sigs_single"), cfg)
    a = resumed.to_pandas().sort_values("row_id").reset_index(drop=True)
    b = single.to_pandas().sort_values("row_id").reset_index(drop=True)
    assert a["row_id"].tolist() == b["row_id"].tolist()
    assert a["simhash"].tolist() == b["simhash"].tolist()
    assert [list(x) for x in a["minhash"]] == [list(x) for x in b["minhash"]]

    # config change wipes and re-signs
    cfg2 = NearDupConfig(
        text_column="content", shingle_k=5, num_perms=64, bands=16,
        threshold=0.65, batch_size=256, simhash_bits=0,
    )
    out2 = sign_corpus_resumable(src, stage, cfg2, rows_per_shard=200)
    assert out2.count() == 1200


def test_incremental_edge_empty_sides(tmp_path):
    """r3 edge sweep: empty new batch and empty prior corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduper_ray.pipelines.incremental import (
        run_neardup_incremental,
        sign_corpus,
    )

    cfg = _cfg()

    def mk(path, texts):
        pq.write_table(
            pa.table(
                {
                    "row_id": pa.array(range(len(texts)), type=pa.int64()),
                    "content": pa.array(texts, pa.string()),
                }
            ),
            path,
        )

    mk(str(tmp_path / "prior.parquet"), ["some document " * 8, "другой doc " * 6])
    sign_corpus(str(tmp_path / "prior.parquet"), str(tmp_path / "sigs"), cfg)
    mk(str(tmp_path / "enew.parquet"), [])
    r = run_neardup_incremental(
        str(tmp_path / "enew.parquet"), str(tmp_path / "o1"), cfg,
        prior_signatures=str(tmp_path / "sigs"),
    )
    assert (r.n_new_docs, r.n_kept) == (0, 0)

    mk(str(tmp_path / "eprior.parquet"), [])
    sign_corpus(str(tmp_path / "eprior.parquet"), str(tmp_path / "esigs"), cfg)
    mk(str(tmp_path / "new.parquet"), ["some document " * 8, "fresh thing " * 9])
    r2 = run_neardup_incremental(
        str(tmp_path / "new.parquet"), str(tmp_path / "o2"), cfg,
        prior_signatures=str(tmp_path / "esigs"),
    )
    assert (r2.n_new_docs, r2.n_kept, r2.n_dup_of_prior) == (2, 2, 0)
