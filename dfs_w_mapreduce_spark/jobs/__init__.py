"""Reference-fidelity analytics jobs.

The reference ships exactly two built-in MapReduce jobs
(reference dfs/wordcountjob.go, dfs/questionpercentagejob.go); these
modules re-express them as declarative DataFrame pipelines with
byte-level output fidelity (whitespace-split semantics, integer
division, '%' suffix).
"""

from dfs_w_mapreduce_spark.jobs.wordcount import wordcount
from dfs_w_mapreduce_spark.jobs.question_pct import question_percentage

__all__ = ["wordcount", "question_percentage"]
