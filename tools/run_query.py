"""Run any registry query from the command line.

Usage:
    python tools/run_query.py <query_name> [sf_dir] [--limit N] [--explain]
    python tools/run_query.py --list [tag]

The operational entry point for a human user (the reference's REPL
`compute <job> ...` equivalent): resolves the named query from the
registry, runs it on the given fixture dir (default sf0.01), and
prints the result table — or, with --explain, the formatted physical
plan instead.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str]) -> int:
    from dfs_w_mapreduce_spark.registry import collect

    args = [a for a in argv if not a.startswith("--")]
    flags = {a for a in argv if a.startswith("--")}
    registry = collect()

    if "--list" in flags or not args:
        tag = args[0] if args else None
        for name, spec in sorted(registry.items()):
            if tag is None or tag in spec.tags:
                print(f"{name:28s} [{','.join(spec.tags)}] {spec.doc}")
        return 0

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in registry:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2
    limit = 20
    for i, a in enumerate(argv):
        if a == "--limit" and i + 1 < len(argv):
            limit = int(argv[i + 1])

    from dfs_w_mapreduce_spark.session import get_spark

    spark = get_spark(f"run:{name}")
    df = registry[name].fn(spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    else:
        df.show(limit, truncate=False)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
