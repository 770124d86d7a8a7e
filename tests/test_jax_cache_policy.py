"""The committed .jax_cache must hold ONLY manifest-ledgered entries and
stay under the size ceiling (VERDICT r4 #8: the policy was prose until
now; this makes orphan entries and silent growth impossible to commit).

The manifest is regenerated only by the documented rebuild procedure
(tools/check_jax_cache.py --update after verbatim bench + entry runs on
the TPU host), so an ad-hoc script that writes stray cache entries — or
a cache that simply grows past the ceiling — fails CI here.
"""

import os

import pytest

from tools.check_jax_cache import (
    CACHE_DIR, SIZE_CEILING_MB, cache_entries, check, load_manifest)


@pytest.fixture(scope="module")
def entries():
    if not os.path.isdir(CACHE_DIR):
        pytest.skip("no .jax_cache in this checkout")
    return cache_entries()


def test_cache_within_size_ceiling(entries):
    total_mb = sum(entries.values()) / 1e6
    assert total_mb <= SIZE_CEILING_MB, (
        f".jax_cache is {total_mb:.1f} MB (ceiling {SIZE_CEILING_MB} MB) — "
        "prune to bench+entry-reachable shapes and regenerate the manifest")


def test_no_orphan_entries(entries):
    known = set(load_manifest().get("entries", {}))
    orphans = sorted(set(entries) - known)
    assert not orphans, (
        f"{len(orphans)} cache entries are not in tools/jax_cache_manifest"
        ".json — only `python bench.py` + `python __graft_entry__.py` run "
        f"verbatim may write the cache. Orphans: {orphans[:5]}")


def test_check_reports_clean_or_fails_loud(entries):
    problems = check()
    assert problems == [], problems
