"""Dump .explain("formatted") for named queries to plans/r12/.

Usage:
    python tools/plan_r12.py before q1 q2 ...
    python tools/plan_r12.py after  q1 q2 ...

Writes plans/r12/<query>_<suffix>.txt — the optimization-round
evidence files (judge checks plan claims against these).
Runs at sf0.1 (the bench scale) unless SPARK_GRAFT_SF_DIR overrides.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str]) -> int:
    suffix, names = argv[0], argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(_REPO) / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)

    from dfs_w_mapreduce_spark.registry import collect
    from dfs_w_mapreduce_spark.session import get_spark

    spark = get_spark("plan_r12")
    registry = collect()
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote plans/r12/{name}_{suffix}.txt", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
