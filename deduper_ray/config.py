"""Job configuration.

Replaces the reference's JNDI-indirected ``Config``/``ConfigBuilder``
(reference: config/Config.kt:68-137) with plain frozen dataclasses:
paths instead of JNDI names, explicit validation instead of runtime
lookup. No builder needed — Python keyword arguments are the builder.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupeConfig:
    """Exact-dedup job config (reference: config/Config.kt:19-55).

    source              parquet file/dir/glob, CSV, or a SQL source url
                        ``sqlite:///path.db?table=T`` / ``?query=...``
                        (reference S1/S2: SourceJndi, Deduper.kt:160-186)
    hash_keys           columns hashed for identity; empty → ALL columns in
                        schema order (reference: Deduper.kt:181-185)
    columns             optional read-time projection (pruned at the read)
    order_by            column defining the global first-occurrence order;
                        None → deterministic file/row-group ordinal
                        (reference row ordinal: Deduper.kt:241)
    seen_hashes         optional parquet (or sqlite url) of previously-
                        seen hashes (reference S3: HashSourceJndi,
                        Deduper.kt:135-158)
    seen_hash_column    column holding the hash in ``seen_hashes``
    target_path         deduped-rows sink: dir, or SQL url
                        ``sqlite:///path.db?table=T`` (reference K1/K2)
    dupes_path          dupe-group sink: dir or ``sqlite:///path.db``
                        (fixed ``dupes`` table, reference K3)
    hashes_path         hash-table sink: dir or ``sqlite:///path.db``
                        (fixed ``hashes`` table, reference K4)
    include_json        include json_row in the hashes output
                        (reference: jndi/JNDIType.kt:62-69)
    """

    source: str
    hash_keys: tuple[str, ...] = ()
    columns: tuple[str, ...] | None = None
    order_by: str | None = None
    seen_hashes: str | None = None
    seen_hash_column: str = "hash"
    target_path: str | None = None
    dupes_path: str | None = None
    hashes_path: str | None = None
    include_json: bool = False
    # "parquet" | "csv" — applies to ALL directory sinks (target, dupes,
    # hashes; reference has per-sink Csv/Sql persistor types,
    # Persistors.kt:147-233); sqlite:// paths override per sink
    target_format: str = "parquet"
    csv_delimiter: str = ","        # reference CsvConfigParser default ','
    csv_extension: str = "txt"      # reference default extension 'txt'
    # fail_soft=True: a sink failure is logged and the job carries on
    # with success=True — the REFERENCE's behavior
    # (DeduperTest.kt:482-497 pins success despite a dead sink). The
    # default False hard-fails, a deliberate, documented improvement.
    fail_soft: bool = False
    # job-level wall-clock budget (reference ExecutionServiceTimeout,
    # config/Config.kt:52-55 / Deduper.kt:534-544): checked at stage
    # boundaries; None → no limit
    execution_timeout_sec: float | None = None
    # "broadcast": narrow groupby stats + broadcast drop-set anti-filter
    #   (default; assumes dupes ≪ rows, same bound the reference's
    #   in-heap dupeMap accepts)
    # "shuffle": grouped first-wins over full rows — one wide all-to-all,
    #   no driver state; for dupe-heavy corpora
    dedupe_strategy: str = "broadcast"
    # "full": dupes sink + report.dupes carry member row-id lists and
    #   first-dupe JSON (reference parity; driver memory = dupe volume)
    # "summary": dupes sink written DISTRIBUTED from the per-hash stats
    #   (hash, first_found_row_number, dupe_count), report.dupes empty —
    #   for adversarial dupe volumes (SCALE.md exact-dedup notes)
    # "distributed": FULL reference K3 schema (hash, row_ids json,
    #   first_found_row_number, dupe_values) assembled and written
    #   entirely distributed (stages/exact.py dupe_groups_ds);
    #   report.dupes empty — full sink fidelity at adversarial volumes
    dupes_detail: str = "full"


@dataclass(frozen=True)
class NearDupConfig:
    """Near-duplicate detection + clustering config (north-rule pipeline).

    The reference has no near-dup operators; this parameterizes the
    shingle → MinHash → LSH → verify → union-find stack (the classic
    Broder/Leskovec-Rajaraman-Ullman construction, with one-permutation
    hashing and an identical-signature collapse on top).

    shingle_k           character-shingle width
    use_token_shingles  shingle over word tokens instead of characters
    num_perms           MinHash signature length K
    bands               LSH band count b; r = num_perms // bands rows
                        per band (trailing remainder slots unused).
                        Default 21 bands × 6 rows: catch probability
                        1-(1-J^6)^21 = 0.998 at J=0.8 (recall target)
                        but only ~1.5% at J=0.3 — selective enough
                        that shared-vocabulary corpora don't flood the
                        candidate set (r=4 caught 23% of J=0.3 pairs).
    threshold           min estimated Jaccard for a verified pair
    simhash_bits        SimHash fingerprint width (0 → skip SimHash verify)
    simhash_max_hamming max Hamming distance for the SimHash verify path
    max_pairs_per_bucket candidate-pair cap per LSH bucket (skew guard;
                        dropped pairs are counted and logged)
    seed                permutation/seed material — fixed for determinism
    """

    text_column: str = "content"
    id_column: str = "row_id"
    shingle_k: int = 8
    use_token_shingles: bool = False
    num_perms: int = 128
    bands: int = 21
    threshold: float = 0.7
    simhash_bits: int = 64
    simhash_max_hamming: int = 8
    # MinHash scheme: "oph" (one-permutation + rotation densification,
    # default) or "classic" (K independent permutations); part of the
    # config hash so switching invalidates signature checkpoints
    minhash_scheme: str = "oph"
    max_pairs_per_bucket: int = 2000
    # count-then-salt skew guard: band buckets above this row count are
    # split into chained sub-buckets before the LSH sort (bounded runs,
    # connectivity preserved — stages/lsh.py salt_hot_buckets).
    # DEFAULT-ON (VERDICT r2 item 4): the pre-count is one narrow
    # pre-aggregated groupby over int64 keys (measured within bench
    # noise), and without it the only guard on a boilerplate-heavy
    # corpus is the LOSSY per-bucket pair cap. None disables.
    hot_bucket_threshold: int | None = 65536
    seed: int = 42
    batch_size: int = 256
    # actor-pool sizing; None → auto: (cpus//4, cpus-2). A pool pinned
    # at full cluster size starves the upstream reader and deadlocks;
    # min-1 autoscaling ramps too slowly to use the cluster. A quarter
    # floor keeps both properties.
    concurrency: int | tuple[int, int] | None = None
    # collapse identical-signature docs (exact dupes) to one
    # representative before LSH banding: removes the O(g²·bands)
    # candidate blowup of exact-dup groups; members re-attach via
    # Jaccard-1.0 identity edges (stages/collapse.py)
    collapse_identical: bool = True
    # "auto" (default): unionfind while the verified-edge count is
    # ≤ cluster_edge_budget, labelprop above it — the default config
    # never materializes an over-budget edge set on the driver;
    # "unionfind": force the driver O(edges) vectorized components;
    # "labelprop": force fully distributed min-label propagation
    cluster_backend: str = "auto"
    # verified-edge count above which "auto" routes clustering to the
    # distributed labelprop backend (mirrors LATE_DEDUP_THRESHOLD)
    cluster_edge_budget: int = 5_000_000
    # "auto" (default): broadcast while the estimated signature-store
    # bytes (n_docs × (num_perms·4 + 24), the actual uint32-sig store
    # layout in stages/verify.py) fit verify_store_budget_bytes,
    # copartition above it — the default config never builds an
    # O(corpus) object-store-resident store;
    # "broadcast": force scoring workers to hold the signature store;
    # "copartition": force the no-broadcast hash-partitioned join
    # verification (bit-identical scores, equivalence-tested)
    verify_backend: str = "auto"
    # estimated store bytes above which "auto" routes verification to
    # copartition (mirrors cluster_edge_budget). None (default) derives
    # the budget at run time as 25% of the cluster's object_store_memory
    # resource: the store is numpy-in-plasma and every scoring task on a
    # node reads it ZERO-COPY, so its residency is one copy per NODE —
    # the right comparison is node object-store capacity, not worker
    # heap. (A fixed 2 GiB default mis-routed a 10^7-doc corpus to
    # copartition on a 128 GiB box; BASELINE.md §10.4.) An explicit int
    # pins the budget.
    verify_store_budget_bytes: int | None = None
    # "signature": pairs scored by MinHash-estimated Jaccard (default —
    # no content re-read, O(K) per pair);
    # "exact": pairs re-scored with the TRUE k-shingle Jaccard
    # (content re-read for candidate-endpoint docs only; pairs output
    # carries exact jaccard/containment instead of estimates). The
    # oracle-verifiable mode: survivors equal the exact-Jaccard≥τ pair
    # set whenever LSH recall is 1.
    verify_mode: str = "signature"

    @property
    def rows_per_band(self) -> int:
        return self.num_perms // self.bands
