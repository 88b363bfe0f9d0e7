"""Verdict-staleness gate (VERDICT r08 task 2).

A driver verdict is only meaningful for the code it actually judged. The r08
subtree sweep rewrote 12 driver-verdicted entries *after* the correctness
window froze, silently invalidating their green records. This tool makes that
failure mode mechanical to catch:

  fingerprint(entry) = sha256 of
      the entry's query-function source
    + its oracle SQL (or "" for rows-only entries)
    + the source of the shared queries.py helpers (load/dsum/davg/_sql_*)
    + the sources of every package FUNCTION/CLASS the entry (transitively)
      calls, resolved function-by-function via AST: module aliases from
      queries.py's top-level imports and the entry body's own
      `from <pkg>... import` statements map `alias.attr` / imported-name
      references to top-level defs in operator modules; each resolved def is
      expanded through same-module and cross-module references; module-level
      CONSTANTS referenced by the closure are hashed too (assignment source),
      so a tuning-constant change flags exactly the entries that read it.

  Function-level granularity matters: a whole-module hash flags every
  `text_*` entry when one text helper changes (measured: 118/320 stale),
  which cannot drain through a 50-slot driver window. At def granularity
  only entries whose actual call closure changed are flagged.

  Shared-surface exemption: `sources.io.read_parquet`/`load` and the
  queries.py decimal helpers are exercised by EVERY driver-window entry
  every round, so any change to them is re-verified by the very next
  window regardless of which entries it contains. They are therefore
  excluded from per-entry fingerprints (measured: including read_parquet
  flagged 168/320 — every entry verdicted before its r04 nano-timestamp
  extension). The helpers' sources are still mixed in (they have never
  changed; if they do, those flags are real).

Modes:
  --snapshot            print {entry: fingerprint} for the CURRENT tree
                        (run in a subprocess by --audit for old trees).
  --audit               full audit: for each registry entry, find its latest
                        driver-verdict round R from CORRECTNESS_r*.json,
                        check out the tree the round-R driver judged
                        (parent of the `round R:` artifact commit) into a
                        temp worktree, fingerprint the entry THERE, and
                        compare with HEAD. Mismatch or no-verdict => stale.
                        Writes STALENESS.json and exits 1 if any stale entry
                        is missing from the head of _WINDOW_PRIORITY.

The end-of-round checklist runs `--audit`; any stale entry must lead the
next round's `_WINDOW_PRIORITY` window (queries.py) or the gate fails.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "big_data_analysis_for_stock_market_data_spark"

import ast
import textwrap


def _mod_to_rel(root: str, dotted: str) -> str | None:
    """Dotted pkg module -> repo-relative .py path, or None."""
    base = dotted.replace(".", "/")
    for cand in (base + ".py", base + "/__init__.py"):
        if os.path.isfile(os.path.join(root, cand)):
            return cand
    return None


class _ModuleIndex:
    """AST index of one package module: top-level defs, their references,
    pkg-internal imports, and a prelude hash for everything else."""

    def __init__(self, root: str, rel: str):
        path = os.path.join(root, rel)
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        self.rel = rel
        lines = src.splitlines(keepends=True)
        tree = ast.parse(src)
        self.defs: dict[str, str] = {}
        self.def_refs: dict[str, set] = {}  # name -> {("name",x)|("attr",a,b)}
        self.consts: dict[str, str] = {}    # top-level assignment source
        self.aliases: dict[str, str] = {}   # local alias -> pkg dotted module
        self.imported: dict[str, tuple[str, str]] = {}  # name -> (module, orig)
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                start = min([node.lineno] + [d.lineno for d in node.decorator_list])
                self.defs[node.name] = "".join(lines[start - 1:node.end_lineno])
                self.def_refs[node.name] = _collect_refs(node)
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                tgts = node.targets if isinstance(node, ast.Assign) else [node.target]
                seg = "".join(lines[node.lineno - 1:node.end_lineno])
                for t in tgts:
                    if isinstance(t, ast.Name):
                        self.consts[t.id] = seg
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name == PKG or a.name.startswith(PKG + "."):
                        self.aliases[a.asname or a.name.split(".")[0]] = a.name
            elif isinstance(node, ast.ImportFrom) and node.module and (
                node.module == PKG or node.module.startswith(PKG + ".")
            ):
                for a in node.names:
                    sub = f"{node.module}.{a.name}"
                    if _mod_to_rel(_INDEX_ROOT, sub):
                        self.aliases[a.asname or a.name] = sub
                    else:
                        self.imported[a.asname or a.name] = (node.module, a.name)


def _collect_refs(node: ast.AST) -> set:
    """Bare names and one-level `base.attr` pairs referenced under node,
    including pkg imports that appear inside the body."""
    refs: set = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            refs.add(("attr", n.value.id, n.attr))
        elif isinstance(n, ast.Name):
            refs.add(("name", n.id))
        elif isinstance(n, ast.ImportFrom) and n.module and (
            n.module == PKG or n.module.startswith(PKG + ".")
        ):
            for a in n.names:
                sub = f"{n.module}.{a.name}"
                if _mod_to_rel(_INDEX_ROOT, sub):
                    refs.add(("localmod", a.asname or a.name, sub))
                else:
                    refs.add(("localname", a.asname or a.name, n.module, a.name))
        elif isinstance(n, ast.Import):
            for a in n.names:
                if a.name == PKG or a.name.startswith(PKG + "."):
                    refs.add(("localmod", a.asname or a.name.split(".")[0],
                              a.name))
    return refs


_INDEX_ROOT = ""
_INDEX_CACHE: dict[str, _ModuleIndex] = {}


def _index(root: str, dotted: str) -> _ModuleIndex | None:
    rel = _mod_to_rel(root, dotted)
    if rel is None:
        return None
    if rel not in _INDEX_CACHE:
        _INDEX_CACHE[rel] = _ModuleIndex(root, rel)
    return _INDEX_CACHE[rel]


def _resolve_refs(root: str, refs: set, aliases: dict[str, str],
                  imported: dict[str, tuple[str, str]],
                  home: str | None) -> set[tuple[str, str]]:
    """Map raw refs to (dotted_module, def_name) targets."""
    out: set[tuple[str, str]] = set()
    local_aliases = dict(aliases)
    local_imported = dict(imported)
    for r in refs:
        if r[0] == "localmod":
            local_aliases[r[1]] = r[2]
        elif r[0] == "localname":
            local_imported[r[1]] = (r[2], r[3])
    for r in refs:
        if r[0] == "attr":
            mod = local_aliases.get(r[1])
            if mod:
                out.add((mod, r[2]))
        elif r[0] == "name":
            if r[1] in local_imported:
                out.add(local_imported[r[1]])
            elif home is not None:
                out.add((home, r[1]))
    return out


def compute_fingerprints(root: str) -> dict[str, str]:
    """{entry: fingerprint} for the package tree rooted at `root`.

    Must run with `root` on sys.path (and no other copy of the package
    importable first) -- --audit guarantees this via subprocesses.
    """
    import inspect

    global _INDEX_ROOT
    _INDEX_ROOT = root
    _INDEX_CACHE.clear()

    sys.path.insert(0, root)
    qmod = __import__(f"{PKG}.queries", fromlist=["queries"])
    queries = qmod.queries()
    oracles = qmod.oracle_sql()
    qidx = _index(root, f"{PKG}.queries")

    helper_src = ""
    for helper in ("load", "dsum", "davg", "_sql_dsum", "_sql_davg"):
        fn = getattr(qmod, helper, None)
        if fn is not None:
            helper_src += inspect.getsource(fn)
    # Shared-surface exemption (see module docstring): read_parquet/load are
    # exercised by every window entry every round -- never fingerprinted.
    exempt = {(f"{PKG}.sources.io", "read_parquet")}

    def closure(targets: set[tuple[str, str]]) -> set[tuple[str, str]]:
        """Expand (module, name) targets transitively through defs; consts
        terminate (their refs are part of their assignment source)."""
        seen: set[tuple[str, str]] = set()
        stack = [t for t in targets if t not in exempt]
        while stack:
            mod, name = stack.pop()
            if (mod, name) in seen:
                continue
            seen.add((mod, name))
            idx = _index(root, mod)
            if idx is None or name not in idx.defs:
                continue
            sub = _resolve_refs(root, idx.def_refs[name], idx.aliases,
                                idx.imported, mod)
            stack.extend(t for t in sub if t not in seen and t not in exempt)
        return seen

    out: dict[str, str] = {}
    for name, fn in queries.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        try:
            fnode = ast.parse(textwrap.dedent(src)).body[0]
            refs = _collect_refs(fnode)
        except SyntaxError:
            refs = set()
        targets = _resolve_refs(
            root, refs, qidx.aliases if qidx else {},
            qidx.imported if qidx else {}, None,
        )
        resolved = closure(targets)
        h = hashlib.sha256()
        h.update(src.encode())
        h.update(oracles.get(name, "").encode())
        h.update(helper_src.encode())
        for mod, dname in sorted(resolved):
            idx = _index(root, mod)
            if idx is None:
                continue
            if dname in idx.defs:
                h.update(f"{mod}.{dname}".encode())
                h.update(idx.defs[dname].encode())
            elif dname in idx.consts:
                h.update(f"{mod}.{dname}=".encode())
                h.update(idx.consts[dname].encode())
        out[name] = h.hexdigest()
    return out


def _latest_verdicts(repo: str) -> dict[str, int]:
    """{entry: latest round with ANY driver record}."""
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(repo)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(repo, fn), encoding="utf-8") as fh:
            data = json.load(fh)
        for entry in data:
            latest[entry] = max(latest.get(entry, 0), rnd)
    return latest


def _round_commit(repo: str, rnd: int) -> str | None:
    """Commit whose tree the round-`rnd` driver judged: parent of the
    `round {rnd}: verdict/...` artifact commit."""
    res = subprocess.run(
        ["git", "log", "--all", "--format=%H %s"],
        cwd=repo, capture_output=True, text=True, check=True,
    )
    for line in res.stdout.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(rf"round {rnd}: verdict", subj):
            return sha + "^"
    return None


def _snapshot_at(repo: str, ref: str) -> dict[str, str]:
    wt = os.path.join(repo, ".staleness_wt")
    subprocess.run(
        ["git", "worktree", "add", "--detach", "--force", wt, ref],
        cwd=repo, capture_output=True, check=True,
    )
    try:
        env = dict(os.environ, PYTHONPATH=wt)
        res = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "verdict_staleness.py"),
             "--snapshot", "--root", wt],
            capture_output=True, text=True, env=env, cwd=wt,
        )
        if res.returncode != 0:
            raise RuntimeError(f"snapshot at {ref} failed:\n{res.stderr[-2000:]}")
        return json.loads(res.stdout.splitlines()[-1])
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=repo, capture_output=True, check=False)


def _window_head(repo: str, n: int) -> list[str]:
    sys.path.insert(0, repo)
    qmod = __import__(f"{PKG}.queries", fromlist=["queries"])
    return list(qmod.queries())[:n]


def audit(repo: str) -> int:
    latest = _latest_verdicts(repo)
    current = compute_fingerprints(repo)

    by_round: dict[int, list[str]] = {}
    for entry in current:
        rnd = latest.get(entry, 0)
        by_round.setdefault(rnd, []).append(entry)

    stale: dict[str, str] = {}
    fallback_rounds: dict[int, str] = {}
    for rnd, entries in sorted(by_round.items()):
        if rnd == 0:
            for e in entries:
                stale[e] = "never-verdicted"
            continue
        ref = _round_commit(repo, rnd)
        if ref is None:
            # FALLBACK MODE: the round-`rnd` artifact commit is missing
            # (typically uncommitted round artifacts), so the strong
            # "compare against the judged tree" check degrades to marking
            # the whole cohort stale. Correct but weaker -- surfaced in
            # STALENESS.json as `fallback_rounds` so a green audit that ran
            # degraded is machine-distinguishable from a strong one.
            fallback_rounds[rnd] = "artifact commit not found"
            for e in entries:
                stale[e] = f"round-{rnd} artifact commit not found"
            continue
        try:
            old = _snapshot_at(repo, ref)
        except RuntimeError as exc:
            print(f"WARN: {exc}", file=sys.stderr)
            fallback_rounds[rnd] = "tree not fingerprintable"
            for e in entries:
                stale[e] = f"round-{rnd} tree not fingerprintable"
            continue
        for e in entries:
            if e not in old:
                stale[e] = f"absent from round-{rnd} registry"
            elif old[e] != current[e]:
                stale[e] = f"code changed since round-{rnd} verdict"

    window = _window_head(repo, 50)
    missing = [e for e in stale if e not in window]
    head_ok = not missing

    report = {
        "n_entries": len(current),
        "n_stale": len(stale),
        "stale": stale,
        "stale_in_window_head": head_ok,
        "stale_missing_from_window": missing,
        "mode": "fallback" if fallback_rounds else "strong",
        "fallback_rounds": {str(r): why for r, why in fallback_rounds.items()},
    }
    with open(os.path.join(repo, "STALENESS.json"), "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
    print(json.dumps({k: report[k] for k in
                      ("n_entries", "n_stale", "stale_in_window_head",
                       "mode")}))
    if stale:
        for e, why in sorted(stale.items()):
            mark = "OK(windowed)" if e in window else "FAIL(not in window)"
            print(f"  stale: {e}: {why} [{mark}]")
    return 0 if head_ok else 1


def main(argv: list[str]) -> int:
    if "--snapshot" in argv:
        root = REPO
        if "--root" in argv:
            i = argv.index("--root")
            if i + 1 >= len(argv):
                print("usage: --snapshot [--root DIR]", file=sys.stderr)
                return 2
            root = argv[i + 1]
        print(json.dumps(compute_fingerprints(root), sort_keys=True))
        return 0
    if "--audit" in argv:
        return audit(REPO)
    print("usage: verdict_staleness.py --audit | --snapshot [--root DIR]",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
