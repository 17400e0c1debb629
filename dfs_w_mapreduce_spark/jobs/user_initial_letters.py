"""Example USER job: initial-letter frequency over a line corpus.

This file is deliberately loaded FROM ITS FILE PATH by
``operators.mapreduce.load_user_job`` (never imported as a package
module) — it stands in for the reference's arbitrary user job binary
(wordcountjob.go:16-39 contract, submitted via client.go:806-811).
Any .py exposing the same two functions runs identically through
``tools/run_job.py``.

Contract:
    map_fn(line: str) -> list[tuple[str, str]]      # Map(lineNo, line)
    reduce_fn(key: str, values: list[str]) -> str   # Reduce(key, vals)
"""


def map_fn(line):
    out = []
    for w in line.split():
        c = w[0].lower()
        if "a" <= c <= "z":
            out.append((c, "1"))
    return out


def reduce_fn(key, values):
    return str(len(values))
