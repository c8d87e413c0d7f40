"""Brute-force (non-DuckDB) oracle for the two full-corpus gram-join
queries at sf0.1, where the SQL oracle's 8-gram self-join is
infeasible (sum C(c,2) = 280M joined rows -> 40 GB DuckDB spill).

Exact method: dense doc x gram incidence matrix (5000 x 13005 at
sf0.1), BLAS matmul for pairwise intersection counts, exact Jaccard
threshold, union-find transitive closure — bit-for-bit the SQL
oracle's semantics, including the prior/new mid namespace for the
incremental variant.
"""
import hashlib
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    try:
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    except Exception:
        pass
    s = df.to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(s.encode()).hexdigest()[:16]


t0 = time.time()
t = pq.read_table(os.path.join(SF, "documents.parquet"),
                  columns=["doc_id", "text"])
ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
texts = t["text"].to_pylist()
n = len(ids)

vocab = {}
rows, cols = [], []
for d, txt in enumerate(texts):
    L = len(txt)
    gset = {txt[i:i + 8] for i in range(max(L - 7, 1))}
    for g in gset:
        gid = vocab.setdefault(g, len(vocab))
        rows.append(d)
        cols.append(gid)
A = np.zeros((n, len(vocab)), dtype=np.float32)
A[rows, cols] = 1.0
sizes = A.sum(axis=1)
print(f"incidence {A.shape} built {time.time()-t0:.1f}s", file=sys.stderr)

inter = A @ A.T
union = sizes[:, None] + sizes[None, :] - inter
jac = inter / union
np.fill_diagonal(jac, 0.0)
ia, ib = np.where(np.triu(jac, 1) >= 0.7)
edges = list(zip(ids[ia].tolist(), ids[ib].tolist()))
print(f"edges {len(edges)} matmul+threshold {time.time()-t0:.1f}s",
      file=sys.stderr)

# ---- union-find over doc_ids (and over mids for the incremental rule)
def components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


# Oracle A: neardup_clusters_docs — docs with >=1 edge, cluster = min id
lbl = components(edges)
brute_clusters = pd.DataFrame(
    {"row_id": sorted(lbl), "cluster_id": [lbl[k] for k in sorted(lbl)]}
)

# Oracle B: incremental_neardup_docs — prior = even ids, new = odd ids
BIG = 1_000_000_000
mid = {int(d): (int(d) if d % 2 == 0 else int(d) + BIG) for d in ids}
mlbl = components([(mid[a], mid[b]) for a, b in edges])
rows_inc = []
for d in sorted(int(x) for x in ids if x % 2 == 1):
    m = mid[d]
    l = mlbl.get(m, m)
    keep = l == m
    reason = "keep" if keep else ("dup_prior" if l < BIG else "dup_new")
    rows_inc.append((d, keep, reason))
brute_inc = pd.DataFrame(rows_inc, columns=["doc_id", "keep", "reason"])
print(f"brute oracles done {time.time()-t0:.1f}s", file=sys.stderr)

# ---- engine side
import ray  # noqa: E402

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as entry  # noqa: E402

q = entry.queries()
eng_clusters = q["neardup_clusters_docs"](SF)
eng_inc = q["incremental_neardup_docs"](SF)
ray.shutdown()

for name, eng, brute in (
    ("neardup_clusters_docs", eng_clusters, brute_clusters),
    ("incremental_neardup_docs", eng_inc, brute_inc),
):
    eng = pd.DataFrame(eng)
    he, hb = value_hash(eng), value_hash(brute)
    ok = he == hb and len(eng) == len(brute)
    print(f"{'PASS' if ok else 'FAIL'} {name}: rows {len(eng)}/{len(brute)} "
          f"hash {he}/{hb} cols "
          f"{sorted(eng.columns) == sorted(brute.columns)} "
          f"[brute-force numpy oracle]")
