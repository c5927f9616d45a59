"""Window-freshness invariant (VERDICT r9 item 2, made a pinned check).

The grading driver hard-checks only the first 50 registry entries per
round, so evidence ages.  Informally the window picker has biased
rotation by (evidence age × code churn); this module makes the rule
mechanical so it cannot silently decay as the registry grows:

    A query is STALE iff the source text of its implementation at the
    round marker of its latest driver row differs from HEAD — i.e. its
    most recent hard driver evidence tested DIFFERENT code.

    INVARIANT: every stale oracle-gated query, and every declared
    query with no driver row at all, must sit in the CURRENT 50-slot
    window (queries.py `_PRIORITY`), where this round's driver run
    will re-pin it.

Granularity is the query's own def: the named function's source
segment (ast-extracted, so formatting-only file churn elsewhere does
not flag it), or for lambda-registered queries the whole
`"name": QuerySpec(...)` registry entry (which also fingerprints the
oracle SQL).  Helper churn below the def is intentionally out of
scope — a helper edit flags every caller whose def also moved, and
the builder's rotation notes plus the judge's plan audit cover the
rest; the pinned check is the floor, not the ceiling.

Round markers are the driver's `round N: verdict/advice/correctness/
bench` commits: the tree at marker(N) is exactly what round N's
correctness run tested.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_MARKER_RE = re.compile(r"^round (\d+): verdict/advice/correctness/bench$")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def latest_rows() -> dict[str, int]:
    """query -> most recent round with a hard driver row."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"_r(\d+)\.json$", f).group(1))
        with open(f) as fh:
            for q in json.load(fh):
                latest[q] = max(latest.get(q, 0), r)
    return latest


@lru_cache(maxsize=1)
def round_markers() -> dict[int, str]:
    """round -> marker commit sha (newest marker wins per round)."""
    out: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        m = _MARKER_RE.match(subject)
        if m:
            out.setdefault(int(m.group(1)), sha)  # log is newest-first
    return out


@lru_cache(maxsize=None)
def _file_at(commit: str, relpath: str) -> str | None:
    try:
        return _git("show", f"{commit}:{relpath}")
    except subprocess.CalledProcessError:
        return None  # file did not exist at that commit


def _def_segment(src: str, fn_name: str) -> str | None:
    """Source text of top-level `def fn_name` in `src`."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            return ast.get_source_segment(src, node)
    return None


def _registry_entry_segment(src: str, query_name: str) -> str | None:
    """Source text of the `"query_name": QuerySpec(...)` value in any
    top-level dict literal (covers lambda-registered queries AND the
    oracle SQL next to them)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for k, v in zip(node.keys, node.values):
                if isinstance(k, ast.Constant) and k.value == query_name:
                    return ast.get_source_segment(src, v)
    return None


def _fingerprint(src: str | None, fn_name: str | None, query: str) -> str | None:
    if src is None:
        return None
    if fn_name is not None:
        return _def_segment(src, fn_name)
    return _registry_entry_segment(src, query)


def stale_queries() -> dict[str, str]:
    """query -> reason, for every declared query whose latest driver
    row is missing or tested different code than HEAD."""
    sys.path.insert(0, REPO)
    from heatmap_spark import queries as Q

    latest = latest_rows()
    markers = round_markers()
    stale: dict[str, str] = {}
    for name, spec in Q.REGISTRY.items():
        fn = spec.fn
        if fn.__name__ == "<lambda>":
            relpath, fn_name = "heatmap_spark/queries.py", None
        else:
            mod = sys.modules[fn.__module__]
            relpath = os.path.relpath(mod.__file__, REPO)
            fn_name = fn.__name__
        r = latest.get(name)
        if r is None:
            stale[name] = "no driver row ever"
            continue
        if r not in markers:
            # row is from the round in progress — tested current code
            continue
        with open(os.path.join(REPO, relpath)) as fh:
            now = _fingerprint(fh.read(), fn_name, name)
        then = _fingerprint(_file_at(markers[r], relpath), fn_name, name)
        if now is None:
            stale[name] = f"cannot locate def in {relpath} at HEAD"
        elif then != now:
            stale[name] = f"code changed since its r{r} driver row ({relpath})"
    return stale


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    from heatmap_spark import queries as Q

    window = set(Q._PRIORITY)
    for q, why in sorted(stale_queries().items()):
        mark = "WINDOWED" if q in window else "UNCOVERED"
        print(f"{mark:9s} {q}: {why}")
