"""Column-function API parity tests (reference train/compress/decompress)."""

from pyspark.sql import functions as F

from fsst_spark.functions import compress_col, decompress_col, train_table
from fsst_spark.kernel.fsst import compressor_from_table, deserialize_table, train


def test_compressor_from_table_roundtrip_exact():
    corpus = [b"the quick brown fox jumps over the lazy dog " * 20] * 30
    c = train(corpus)
    blob = c.table_bytes()
    c2 = compressor_from_table(*deserialize_table(blob))
    for v in [corpus[0], b"", b"unseen \xff\x00 bytes", corpus[0][:13]]:
        enc2 = c2.compress(v)
        # decode with the ORIGINAL table must invert the rebuilt encoder
        assert c.decompressor().decompress(enc2) == v


def test_column_functions_roundtrip(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = train_table(df, "text")
    assert len(table) <= 3 + 255 + 255 * 8
    out = df.select(
        "doc_id", "text",
        compress_col(table)(F.col("text").cast("binary")).alias("z"),
    )
    back = out.select(
        "doc_id", "text",
        decompress_col(table)(F.col("z")).alias("t2"),
        F.length("z").alias("zlen"),
    )
    rows = back.withColumn("ok", F.col("t2") == F.col("text").cast("binary")) \
        .agg(F.count("*").alias("n"), F.sum(F.col("ok").cast("int")).alias("n_ok"),
             F.sum("zlen").alias("z_bytes"),
             F.sum(F.length("text")).alias("raw_bytes")).collect()[0]
    assert rows["n"] == rows["n_ok"]
    assert rows["z_bytes"] < rows["raw_bytes"] / 1.5  # real compression


def test_column_functions_preserve_nulls_and_empty(spark):
    """NULL stays NULL and '' stays '' through compress/decompress — they
    must never be conflated (validity mask, like the chunked codec path)."""
    df = spark.createDataFrame(
        [(1, b"hello world hello world"), (2, None), (3, b""), (4, b"x")],
        "id long, v binary",
    )
    table = train_table(df, "v")
    out = df.withColumn("z", compress_col(table)(F.col("v")))
    back = out.withColumn("t2", decompress_col(table)(F.col("z"))).collect()
    got = {r["id"]: (r["z"], r["t2"]) for r in back}
    assert got[2] == (None, None)
    assert got[3][0] is not None and bytes(got[3][1]) == b""
    assert bytes(got[1][1]) == b"hello world hello world"
    assert bytes(got[4][1]) == b"x"
