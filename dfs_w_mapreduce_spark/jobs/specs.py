"""QuerySpecs for the reference-fidelity jobs (SURVEY.md §2.3-2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dfs_w_mapreduce_spark.registry import QuerySpec
from dfs_w_mapreduce_spark.jobs.wordcount import wordcount, wordcount_oracle_sql
from dfs_w_mapreduce_spark.jobs.question_pct import (
    parse_dialog,
    question_percentage,
    question_percentage_oracle_sql,
    question_percentage_typed,
)
from dfs_w_mapreduce_spark.sources.readers import (
    TEXT_LINES_SQL,
    dialog_lines,
    dialog_lines_sql,
    text_lines,
)


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wordcount(text_lines(spark, sf_dir))


def q_question_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return question_percentage(dialog_lines(spark, sf_dir))


def q_question_pct_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return question_percentage_typed(dialog_lines(spark, sf_dir))


def q_dialog_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_dialog(dialog_lines(spark, sf_dir))


DIALOG_PARSE_ORACLE = f"""
    SELECT toks[1] AS line_id,
           toks[2] AS character_id,
           toks[3] AS movie_id,
           toks[4] AS character_name,
           toks[5] AS utterance
    FROM (
        SELECT string_split(value, ' +++$+++ ') AS toks
        FROM ({dialog_lines_sql()})
    )
"""


def specs() -> list[QuerySpec]:
    return [
        QuerySpec(
            name="wordcount",
            fn=q_wordcount,
            oracle=wordcount_oracle_sql(TEXT_LINES_SQL),
            tags=("reference", "mapreduce"),
            doc="Reference job #1: whitespace-split word counts "
            "(reference dfs/wordcountjob.go:16-39).",
        ),
        QuerySpec(
            name="question_pct",
            fn=q_question_pct,
            oracle=question_percentage_oracle_sql(dialog_lines_sql()),
            tags=("reference", "mapreduce", "fidelity"),
            doc="Reference job #2, byte-level fidelity: integer-division "
            "percentage with '%' suffix "
            "(reference dfs/questionpercentagejob.go:16-64).",
        ),
        QuerySpec(
            name="question_pct_typed",
            fn=q_question_pct_typed,
            oracle=f"""
                SELECT character,
                       CAST((100 * sum(is_q)) // count(*) AS BIGINT) AS pct
                FROM (
                    SELECT toks[2] || ' ' || toks[4] AS character,
                           CASE WHEN contains(toks[5], '?') THEN 1 ELSE 0 END AS is_q
                    FROM (SELECT string_split(value, ' +++$+++ ') AS toks
                          FROM ({dialog_lines_sql()}))
                )
                GROUP BY character
            """,
            tags=("reference", "mapreduce"),
            doc="Reference job #2, typed form (bigint percentage).",
        ),
        QuerySpec(
            name="dialog_parse",
            fn=q_dialog_parse,
            oracle=DIALOG_PARSE_ORACLE,
            tags=("reference", "source"),
            doc="Dialog-corpus parser: raw ' +++$+++ ' lines -> typed columns "
            "(FIXTURES.md A2).",
        ),
    ]
