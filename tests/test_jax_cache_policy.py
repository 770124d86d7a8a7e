"""The committed .jax_cache must hold ONLY manifest-ledgered entries and
stay under the size ceiling (VERDICT r4 #8: the policy was prose until
now; this makes orphan entries and silent growth impossible to commit).

The policy judges the GIT-TRACKED cache set, not the working tree: any
fresh ``python bench.py`` on the TPU host (including the driver's own
post-commit run) may write streaming micro-batch bucket shapes that
depend on that run's link conditions, and those untracked strays are
expected — they violate the policy only if committed without
regenerating the manifest (tools/check_jax_cache.py --update, run only
after the documented verbatim bench + entry rebuild).
"""

import os

import pytest

from tools.check_jax_cache import (
    CACHE_DIR, SIZE_CEILING_MB, check, load_manifest, tracked_entries)


@pytest.fixture(scope="module")
def entries():
    if not os.path.isdir(CACHE_DIR):
        pytest.skip("no .jax_cache in this checkout")
    return tracked_entries()


def test_cache_within_size_ceiling(entries):
    total_mb = sum(entries.values()) / 1e6
    assert total_mb <= SIZE_CEILING_MB, (
        f"committed .jax_cache is {total_mb:.1f} MB (ceiling "
        f"{SIZE_CEILING_MB} MB) — prune to bench+entry-reachable shapes "
        "and regenerate the manifest")


def test_no_orphan_entries(entries):
    known = set(load_manifest().get("entries", {}))
    orphans = sorted(set(entries) - known)
    assert not orphans, (
        f"{len(orphans)} committed cache entries are not in tools/"
        "jax_cache_manifest.json — only `python bench.py` + "
        "`python __graft_entry__.py` run verbatim may write the cache, "
        f"and commits must follow --update. Orphans: {orphans[:5]}")


def test_check_reports_clean_or_fails_loud(entries):
    problems = check()
    assert problems == [], problems
