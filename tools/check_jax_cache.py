"""Mechanical .jax_cache policy check (VERDICT r4 #8).

The committed compile cache exists so the DRIVER's ``python bench.py`` /
``python __graft_entry__.py`` runs hit warm compiles.  Cache keys are
in-process-history dependent on this stack (CLAUDE.md "TPU tunnel
gotchas"), so the only entries that can ever be hit are the ones written
by those two commands run verbatim; anything else is dead weight that
accretes in git history.

Policy, enforced by tests/test_jax_cache_policy.py on every run:
  1. total size <= SIZE_CEILING_MB;
  2. every entry in .jax_cache/ appears in tools/jax_cache_manifest.json —
     the ledger written at rebuild time — so orphan entries cannot be
     committed silently.

Rebuild procedure (TPU host):
    rm -rf .jax_cache
    python bench.py
    python __graft_entry__.py
    python tools/check_jax_cache.py --update   # regenerate the manifest
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.join(REPO, ".jax_cache")
MANIFEST = os.path.join(REPO, "tools", "jax_cache_manifest.json")
# Round-5 rebuild measures 242 MB for the full bench+entry program set —
# the r5 face-density sweep alone adds three ~20 MB fused-loop programs
# (F=1/4/8) on top of r4's ~190 MB.  260 gives ~7% headroom over the
# measured set while still catching accretion (an orphan fused program
# is ~12-22 MB, i.e. 2-3 strays trip the ceiling).
SIZE_CEILING_MB = 260.0


def cache_entries() -> dict:
    """{filename: size_bytes} for every cache entry on disk."""
    if not os.path.isdir(CACHE_DIR):
        return {}
    out = {}
    for name in sorted(os.listdir(CACHE_DIR)):
        path = os.path.join(CACHE_DIR, name)
        if os.path.isfile(path):
            out[name] = os.path.getsize(path)
    return out


def tracked_entries() -> dict:
    """{filename: size_bytes} for the GIT-TRACKED cache entries — the set
    the policy judges.  Untracked strays are expected in a working
    checkout: the streaming sections' micro-batch buckets depend on the
    run's link conditions, so any fresh ``python bench.py`` (including
    the driver's own) may compile a bucket shape the committed set lacks.
    Those strays only become policy violations if someone ``git add``s
    them without regenerating the manifest.  Falls back to the on-disk
    listing when git is unavailable."""
    import subprocess

    try:
        r = subprocess.run(
            ["git", "ls-files", "--", ".jax_cache"],
            capture_output=True, text=True, timeout=10, cwd=REPO)
        if r.returncode != 0:
            return cache_entries()
        names = {os.path.basename(p) for p in r.stdout.split() if p}
    except Exception:
        return cache_entries()
    disk = cache_entries()
    return {n: disk.get(n, 0) for n in sorted(names)}


def load_manifest() -> dict:
    try:
        with open(MANIFEST) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"entries": {}, "total_mb": 0.0}


def check() -> list:
    """-> list of violation strings (empty = policy holds).

    Judges the COMMITTED (git-tracked) cache: fresh TPU runs legitimately
    write link-condition-dependent streaming bucket shapes that are not in
    the committed set, and those untracked strays must not fail the tree —
    they fail only if committed without a manifest regen."""
    entries = tracked_entries()
    problems = []
    total_mb = sum(entries.values()) / 1e6
    if total_mb > SIZE_CEILING_MB:
        problems.append(
            f"committed cache size {total_mb:.1f} MB exceeds ceiling "
            f"{SIZE_CEILING_MB} MB")
    manifest = load_manifest()
    known = set(manifest.get("entries", {}))
    orphans = sorted(set(entries) - known)
    if orphans:
        problems.append(
            f"{len(orphans)} committed cache entries not in the manifest "
            f"(written by something other than the verbatim bench/entry "
            f"rebuild, or committed without --update): "
            + ", ".join(o[:24] for o in orphans[:5])
            + ("..." if len(orphans) > 5 else ""))
    return problems


def update_manifest():
    entries = cache_entries()
    prev = set(load_manifest().get("entries", {}))
    with open(MANIFEST, "w") as f:
        json.dump({
            "entries": entries,
            "total_mb": round(sum(entries.values()) / 1e6, 1),
            "count": len(entries),
        }, f, indent=1, sort_keys=True)
        f.write("\n")
    added, gone = sorted(set(entries) - prev), sorted(prev - set(entries))
    print(f"manifest: {len(entries)} entries, "
          f"{sum(entries.values()) / 1e6:.1f} MB "
          f"(+{len(added)} new, -{len(gone)} removed vs previous)")
    # Every on-disk entry gets ledgered — which is correct ONLY after the
    # documented rebuild (rm -rf .jax_cache; bench; entry).  Running
    # --update over a cache that still holds entries from ad-hoc scripts
    # would legitimize exactly the orphans the policy blocks, so make the
    # additions visible for the operator to sanity-check before `git add`.
    for name in added:
        print(f"  + {name[:56]}  ({entries[name] / 1e6:.1f} MB)")


if __name__ == "__main__":
    if "--update" in sys.argv:
        update_manifest()
        sys.exit(0)
    problems = check()
    for p in problems:
        print(f"POLICY VIOLATION: {p}")
    sys.exit(1 if problems else 0)
