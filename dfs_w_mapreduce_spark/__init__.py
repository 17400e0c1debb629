"""dfs_w_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference system
``bpatrickporter/dfs-w-mapreduce`` (a Go DFS + MapReduce engine; see
SURVEY.md).  Storage, replication, scheduling, and shuffle are
delegated to Spark/HDFS; this package owns the *query surface*:

- the reference's two built-in analytics jobs (WordCount,
  QuestionPercentage) with byte-level fidelity,
- a generic map/reduce operator pair matching the reference's
  ``Map(line) -> [(k, v)]`` / ``Reduce(k, values) -> (k, v)`` contract,
- the standard relational operator surface (joins, aggregates,
  windows, set ops, sorts, approx ops) the reference lacks,
- Structured Streaming over the events table,
- LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst + AQE pick the
physical strategy; Pandas UDFs are used only where built-ins cannot
express the semantics.
"""

from dfs_w_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
