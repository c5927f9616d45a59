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

VERDICT r10 item 2 adds a second, age-based rule on top of the
code-churn rule: untouched queries must not carry ancient evidence
forever as the registry grows.

    MAX-AGE INVARIANT: every declared query whose latest driver row
    is older than (current_round - AGE_LIMIT) must sit in the
    current 50-slot window.

AGE_LIMIT = 7 by capacity arithmetic, not taste: 290 declared
queries over ~46 effective slots per round (50 minus the 4
every-round pyramid sentinels, minus slots consumed by new
landings and churn re-pins) is a ~6.3-round full-rotation period,
so 7 is the tightest bound the window can actually sustain; 6 would
demand 70 re-pins in a 50-slot round-11 window.
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

#: Max rounds a query's latest driver row may lag the current round
#: before it MUST be re-windowed (see module docstring for the
#: capacity arithmetic behind 7).
AGE_LIMIT = 7


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


@lru_cache(maxsize=64)
def _def_index(src: str) -> dict[str, str]:
    """name → source text of every top-level def in `src` (cached —
    see _entry_index)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}
    return {
        node.name: ast.get_source_segment(src, node)
        for node in tree.body
        if isinstance(node, ast.FunctionDef)
    }


def _def_segment(src: str, fn_name: str) -> str | None:
    return _def_index(src).get(fn_name)


@lru_cache(maxsize=32)
def _entry_index(src: str) -> dict[str, str]:
    """One-pass index of every `"name": QuerySpec(...)` dict entry in
    `src` → entry source text (covers the oracle SQL) PLUS the
    segments of any module-level constants the entry references (so
    `QuerySpec(fn, _KS_SQL)` is fingerprinted through to the SQL
    text).  Cached per source string: fingerprinting 289 queries
    against N markers must not reparse the 7k-line registry 289·N
    times."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}
    assigns: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    assigns[tgt.id] = ast.get_source_segment(src, node.value)
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for k, v in zip(node.keys, node.values):
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    seg = ast.get_source_segment(src, v)
                    refs = sorted(
                        {
                            n.id
                            for n in ast.walk(v)
                            if isinstance(n, ast.Name) and n.id in assigns
                        }
                    )
                    out.setdefault(
                        k.value,
                        seg
                        + "".join(f"\n# {r}:\n{assigns[r]}" for r in refs),
                    )
    return out


def _registry_entry_segment(src: str, query_name: str) -> str | None:
    return _entry_index(src).get(query_name)


def _fingerprint(
    mod_src: str | None,
    reg_src: str | None,
    fn_name: str | None,
    query: str,
) -> str | None:
    """def text (from the fn's module) + registry entry text incl.
    referenced constants (from queries.py) — so BOTH an implementation
    edit and an oracle edit invalidate old driver evidence."""
    if reg_src is None:
        return None
    entry = _registry_entry_segment(reg_src, query)
    if fn_name is None:
        return entry
    if mod_src is None:
        return None
    seg = _def_segment(mod_src, fn_name)
    if seg is None:
        return None
    return seg + "\n" + (entry or "")


def stale_queries() -> dict[str, str]:
    """query -> reason, for every declared query whose latest driver
    row is missing or tested different code than HEAD."""
    sys.path.insert(0, REPO)
    from heatmap_spark import queries as Q

    latest = latest_rows()
    markers = round_markers()
    reg_rel = "heatmap_spark/queries.py"
    with open(os.path.join(REPO, reg_rel)) as fh:
        reg_now = fh.read()
    stale: dict[str, str] = {}
    for name, spec in Q.REGISTRY.items():
        fn = spec.fn
        if fn.__name__ == "<lambda>":
            relpath, fn_name = reg_rel, None
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
        if relpath == reg_rel:
            mod_now = reg_now
        else:
            with open(os.path.join(REPO, relpath)) as fh:
                mod_now = fh.read()
        now = _fingerprint(mod_now, reg_now, fn_name, name)
        then = _fingerprint(
            _file_at(markers[r], relpath),
            _file_at(markers[r], reg_rel),
            fn_name,
            name,
        )
        if now is None:
            stale[name] = f"cannot locate def/entry for {name} at HEAD"
        elif then != now:
            stale[name] = (
                f"code or oracle changed since its r{r} driver row ({relpath})"
            )
    return stale


def current_round() -> int:
    """The round in progress = latest recorded correctness round + 1."""
    rounds = [
        int(re.search(r"_r(\d+)\.json$", f).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) if rounds else 0) + 1


def overage_queries(age_limit: int = AGE_LIMIT) -> dict[str, str]:
    """query -> reason, for every declared query whose latest driver
    row is older than current_round - age_limit (never-checked queries
    are reported by stale_queries, not here)."""
    sys.path.insert(0, REPO)
    from heatmap_spark import queries as Q

    latest = latest_rows()
    floor = current_round() - age_limit
    return {
        name: f"latest driver row r{latest[name]} older than floor r{floor}"
        for name in Q.REGISTRY
        if name in latest and latest[name] < floor
    }


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    from heatmap_spark import queries as Q

    window = set(Q._PRIORITY)
    merged = {**overage_queries(), **stale_queries()}
    for q, why in sorted(merged.items()):
        mark = "WINDOWED" if q in window else "UNCOVERED"
        print(f"{mark:9s} {q}: {why}")
