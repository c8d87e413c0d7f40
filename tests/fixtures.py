"""Test-facing re-exports of the deterministic synthetic generators
(FIXTURES.md F1-F3) — implementation lives in deduper_ray.sources.synth
so bench.py can build the scaling corpus from the same code."""

from deduper_ray.sources.synth import (  # noqa: F401
    RE_COLUMNS,
    RE_HASH_KEYS,
    make_code_files,
    make_real_estate,
    make_tracks,
)
