"""Source/sink lifecycle tests — the reference's put/get/delete
surface (SURVEY.md S1-S3) under Spark: write, read back, verify
byte-identical content, delete. Plus the text/csv/json reader formats
the engine exposes beyond the reference's text-only connector."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.sources.readers import read_parquet, read_text, write_parquet


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    """put -> get: parquet write + read back is lossless (the
    reference verifies SHA-256 per chunk; parquet checksums + value
    equality subsume it)."""
    out = str(tmp_path / "roundtrip.parquet")
    src = read_parquet(spark, os.path.join(sf_dir, "nation.parquet"))
    write_parquet(src, out)
    back = read_parquet(spark, out)
    assert sorted(map(tuple, src.collect())) == sorted(map(tuple, back.collect()))
    # delete (reference S3): filesystem remove + re-read fails
    shutil.rmtree(out)
    assert not os.path.exists(out)


def test_text_roundtrip_line_chunking(spark, tmp_path):
    """Line-oriented text: records never straddle splits (the property
    the reference hand-builds in SendLineChunks, client.go:386-459)."""
    p = str(tmp_path / "lines.txt")
    lines = ["alpha beta", "", "gamma  delta\ttab", "last"]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    df = read_text(spark, p)
    got = [r.value for r in df.collect()]
    assert sorted(got) == sorted(lines)


def test_partitioned_write(spark, sf_dir, tmp_path):
    """Partitioned sink (hive-layout) + partition pruning on read."""
    out = str(tmp_path / "orders_by_status")
    src = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    one = back.filter(F.col("o_orderstatus") == "F")
    want = src.filter(F.col("o_orderstatus") == "F").count()
    assert one.count() == want
    # partition pruning: the F-filtered scan should list only the F dir
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_csv_json_readers(spark, tmp_path):
    csv = str(tmp_path / "t.csv")
    with open(csv, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = spark.read.csv(csv, header=True, schema="a int, b string")
    assert {(r.a, r.b) for r in df.collect()} == {(1, "x"), (2, "y")}

    js = str(tmp_path / "t.jsonl")
    with open(js, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    dj = spark.read.json(js, schema="a long, b string")
    assert {(r.a, r.b) for r in dj.collect()} == {(1, "x"), (2, "y")}


def test_chunked_datasource_contract(spark, sf_dir):
    """The refchunks DataSource: per-chunk 0-based line numbers, chunk
    sizes equal lines_per_chunk except the tail, total lines = corpus
    rows, and planning tolerates lines_per_chunk > row count."""
    from dfs_w_mapreduce_spark.sources.chunked_source import ChunkedTextDataSource

    spark.dataSource.register(ChunkedTextDataSource)
    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = spark.read.parquet(path).count()

    df = (
        spark.read.format("refchunks")
        .option("path", path)
        .option("lines_per_chunk", "64")
        .load()
    )
    rows = df.collect()
    assert len(rows) == n_docs
    by_chunk = {}
    for r in rows:
        by_chunk.setdefault(r.chunk_id, []).append(r.line_no)
    for cid, lines in by_chunk.items():
        assert sorted(lines) == list(range(len(lines)))
        if cid < max(by_chunk) :
            assert len(lines) == 64

    # one giant chunk: single partition, still the whole corpus
    one = (
        spark.read.format("refchunks")
        .option("path", path)
        .option("lines_per_chunk", str(n_docs * 10))
        .load()
    )
    assert one.count() == n_docs
    assert one.select("chunk_id").distinct().count() == 1


def test_chunked_writer_respects_chunk_size(spark, sf_dir):
    """refchunks writer contract: every emitted file holds at most
    lines_per_chunk lines and the union of files is the exact corpus."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.catalog import load_table
    from dfs_w_mapreduce_spark.sources.chunked_source import ChunkedTextDataSource

    spark.dataSource.register(ChunkedTextDataSource)
    src = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.mkdtemp(prefix="graft_chunktest_"), "chunks")
    (
        src.select(F.col("text").alias("value"))
        .write.format("refchunks")
        .option("path", out)
        .option("lines_per_chunk", "25")
        .mode("append")
        .save()
    )
    files = [os.path.join(out, f) for f in os.listdir(out)]
    assert files
    total = 0
    for p in files:
        with open(p) as f:
            n = sum(1 for _ in f)
        assert 0 < n <= 25, (p, n)
        total += n
    assert total == src.count()


def test_byte_chunk_roundtrip_and_corruption(spark, sf_dir):
    """refchunks byte mode (reference SendByteChunks): fixed-size
    chunks named {counter}_{fileName}, SHA-256 manifest, byte-exact
    reassembly — and a flipped byte in any chunk file must fail the
    read with the manifest-verify error (client.go:606-615)."""
    import hashlib
    import os
    import tempfile

    import pytest
    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.catalog import load_table
    from dfs_w_mapreduce_spark.sources.chunked_source import ChunkedTextDataSource

    spark.dataSource.register(ChunkedTextDataSource)
    src = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            F.col("doc_id").cast("string").alias("file_name"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    )
    expected = {
        r.file_name: bytes(r.payload) for r in src.collect() if r.payload
    }
    out = os.path.join(tempfile.mkdtemp(prefix="graft_bytechunk_"), "store")
    (
        src.write.format("refchunks")
        .option("path", out)
        .option("chunk_mode", "bytes")
        .option("bytes_per_chunk", "64")
        .mode("append")
        .save()
    )
    # chunk naming contract: {counter}_{fileName}, fixed 64B chunks
    chunk_files = [f for f in os.listdir(out) if not f.startswith("manifest-")]
    assert all("_" in f and f.split("_", 1)[0].isdigit() for f in chunk_files)
    assert all(os.path.getsize(os.path.join(out, f)) <= 64 for f in chunk_files)
    assert any(f.startswith("1_") for f in chunk_files)  # multi-chunk files exist

    back = (
        spark.read.format("refchunks")
        .option("path", out)
        .option("chunk_mode", "bytes")
        .load()
    )
    rows = back.collect()
    got: dict = {}
    for r in sorted(rows, key=lambda r: (r.file_name, r.chunk_idx)):
        got[r.file_name] = got.get(r.file_name, b"") + bytes(r.payload)
        assert hashlib.sha256(bytes(r.payload)).hexdigest() == r.checksum
        assert r.n_bytes == len(r.payload)
    assert got == expected  # byte-exact reassembly

    # bit-rot one multi-chunk file's chunk 1 and expect the read to die
    victim = sorted(f for f in chunk_files if f.startswith("1_"))[0]
    p = os.path.join(out, victim)
    raw = bytearray(open(p, "rb").read())
    raw[0] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(Exception, match="corrupt"):
        back.collect()
