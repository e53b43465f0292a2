"""The ``fsst`` Spark DataSource: format round-trip, pushed-filter
correctness, and executor-side chunk pruning (zones + dict + bloom)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.sources.fsst_source import (
    FsstReader,
    _file_survivors,
    register,
    store_column_types,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "n_chars", "source")
    )


@pytest.fixture(scope="module")
def store(spark, docs, tmp_path_factory):
    """A store written THROUGH the DataSource write path (4 partitions,
    small chunks so pruning has something to prune)."""
    out = str(tmp_path_factory.mktemp("fsst_source_store"))
    register(spark)
    # small Arrow batches so chunk_bytes actually splits each partition
    # into several chunks (zone pruning needs >1 chunk to have any teeth)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        (docs.repartition(4, "doc_id").sortWithinPartitions("doc_id")
             .write.format("fsst").mode("overwrite")
             .option("chunk_bytes", 2 << 10).save(out))
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return out


def test_write_then_read_roundtrip(spark, docs, store):
    back = spark.read.format("fsst").load(store)
    cols = sorted(docs.columns)
    assert back.columns == cols  # schema() sorts columns
    a = back.select(*cols).orderBy("doc_id").collect()
    b = docs.select(*cols).orderBy("doc_id").collect()
    assert a == b


def test_pushed_filters_match_plain_scan(spark, docs, store):
    back = spark.read.format("fsst").load(store)
    for cond in [
        (F.col("n_chars") >= 300) & (F.col("lang") == "de"),
        F.col("doc_id") < 50,
        F.col("lang").isin("de", "fr"),
        F.col("source").startswith("cc"),
    ]:
        got = back.where(cond).agg(
            F.count("*").alias("n"), F.sum("doc_id").alias("s")).collect()
        want = docs.where(cond).agg(
            F.count("*").alias("n"), F.sum("doc_id").alias("s")).collect()
        assert got == want, str(cond)


def test_zone_pruning_drops_chunks(store):
    """doc_id-clustered store: a selective doc_id range must prune most
    chunks at the metadata level, and an impossible range prunes all."""
    types = store_column_types(store)
    files = sorted(glob.glob(os.path.join(store, "chunks", "*.parquet")))
    total = live = 0
    for f in files:
        all_keys = _file_survivors(f, [("doc_id", ">=", 0)], types)
        hit = _file_survivors(f, [("doc_id", ">=", 490)], types)
        none = _file_survivors(f, [("doc_id", ">", 10_000_000)], types)
        total += len(all_keys)
        live += len(hit)
        assert none == set()
    assert total > 4  # the small chunk_bytes actually made multiple chunks
    assert 0 < live < total / 2


def test_dict_and_bloom_pruning(store):
    types = store_column_types(store)
    files = sorted(glob.glob(os.path.join(store, "chunks", "*.parquet")))
    # a language no document has: dictionary membership kills every chunk
    for f in files:
        assert _file_survivors(f, [("lang", "==", "zz")], types) == set()
    # an int value no chunk contains: bloom (or zones) prune fully
    for f in files:
        assert _file_survivors(f, [("doc_id", "==", 987654321)], types) == set()


def test_reader_pushfilters_returns_all_filters(store):
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull

    types = store_column_types(store)
    r = FsstReader(store, types)
    filters = [
        GreaterThanOrEqual(("n_chars",), 300),
        EqualTo(("lang",), "de"),
        IsNotNull(("source",)),          # unsupported for pruning
        EqualTo(("n_chars",), "oops"),   # type mismatch: skipped, not raised
    ]
    out = list(r.pushFilters(filters))
    assert out == filters  # chunk pruning is conservative: Spark re-filters
    assert ("n_chars", ">=", 300) in r.pruning
    assert ("lang", "==", "de") in r.pruning
    assert len(r.pruning) == 2


def test_append_mode_grows_store(spark, docs, tmp_path):
    """mode('append') is an incremental load: new partitions take pids
    past every existing one; prior chunk files are never touched."""
    out = str(tmp_path / "appendable")
    register(spark)
    first = docs.where("doc_id < 100")
    rest = docs.where("doc_id >= 100")
    first.write.format("fsst").mode("append").save(out)
    files_before = set(glob.glob(os.path.join(out, "chunks", "*.parquet")))
    rest.write.format("fsst").mode("append").save(out)
    assert files_before < set(glob.glob(os.path.join(out, "chunks", "*.parquet")))
    back = spark.read.format("fsst").load(out)
    assert back.count() == docs.count()
    assert back.agg(F.sum("doc_id")).collect() == docs.agg(F.sum("doc_id")).collect()


def test_append_to_job_written_store_refused(spark, docs, tmp_path):
    """pid keying differs between encode modes; appending across them is
    refused (the resume-mode-mixing guard, extended to the DataSource)."""
    from fsst_spark.jobs.encode import encode_job

    out = str(tmp_path / "jobstore")
    encode_job(spark, docs.limit(50), out, chunk_bytes=64 << 10,
               resume=False, pre_partitioned=True, unique_col="doc_id").collect()
    register(spark)
    with pytest.raises(Exception, match="encode mode"):
        docs.limit(5).write.format("fsst").mode("append").save(out)


def test_store_readable_by_decode_job(spark, docs, store):
    """A DataSource-written store is a normal store: the job-API decoder
    reads it bit-identically."""
    from fsst_spark.jobs.decode import decode_job

    dec = decode_job(spark, store).drop("pid", "chunk_id")
    a = dec.select(*sorted(docs.columns)).orderBy("doc_id").collect()
    b = docs.select(*sorted(docs.columns)).orderBy("doc_id").collect()
    assert a == b
