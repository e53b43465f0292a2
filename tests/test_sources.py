"""Source-layer tests: parquet path works end-to-end; Iceberg path is
availability-gated with a clear error when the runtime jar is absent."""

import pytest

from fsst_spark.sources import iceberg_available, read_table, table_files
from fsst_spark.synth.webcorpus import synth_web_df


@pytest.fixture(scope="module")
def pq_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("src_tbl"))
    synth_web_df(spark, 300, seed=5, parallelism=3).write.mode("overwrite").parquet(d)
    return d


def test_read_table_parquet(spark, pq_dir):
    df = read_table(spark, pq_dir)
    assert df.count() == 300
    assert "text" in df.columns


def test_table_files_sorted_deterministic(spark, pq_dir):
    files = table_files(spark, pq_dir)
    assert files == sorted(files) and len(files) >= 3
    assert files == table_files(spark, pq_dir)  # stable for resume pids


def test_table_files_missing_dir(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        table_files(spark, str(tmp_path / "nope"))


def test_iceberg_gated(spark):
    # this sandbox ships no Iceberg runtime: the gate must say so clearly
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; gate not exercisable")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_table(spark, "iceberg:cat.db.pages")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        table_files(spark, "iceberg:cat.db.pages")


def test_encode_files_job_via_sources(spark, pq_dir, tmp_path):
    from pyspark.sql import functions as F

    from fsst_spark.jobs.encode import encode_files_job, read_manifest

    out = str(tmp_path / "enc")
    encode_files_job(spark, pq_dir, out, chunk_bytes=1 << 20).collect()
    assert read_manifest(spark, out).agg(F.sum("n_rows")).collect()[0][0] == 300


class _Recorder:
    """Stand-in for spark.read that records the format/load call chain and
    plays back canned results — pins the Iceberg call contract without an
    Iceberg runtime on the classpath."""

    def __init__(self, rows):
        self.calls = []
        self._rows = rows

    # DataFrameReader surface
    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def load(self, ident):
        self.calls.append(("load", ident))
        return self

    # DataFrame surface used by table_files
    def select(self, *cols):
        self.calls.append(("select", cols))
        return self

    def orderBy(self, *cols):
        self.calls.append(("orderBy", cols))
        return self

    def collect(self):
        self.calls.append(("collect",))
        return self._rows


class _FakeSpark:
    def __init__(self, rows=()):
        self.read = _Recorder(list(rows))


def test_iceberg_read_table_contract(monkeypatch):
    """Executes the iceberg: branch of read_table against a recorder so
    signature drift can't hide behind the availability gate."""
    from fsst_spark.sources import tables

    monkeypatch.setattr(tables, "iceberg_available", lambda s: True)
    fake = _FakeSpark()
    out = tables.read_table(fake, "iceberg:cat.db.pages")
    assert fake.read.calls == [("format", "iceberg"), ("load", "cat.db.pages")]
    assert out is fake.read  # the loaded frame is returned as-is


def test_iceberg_table_files_contract(monkeypatch):
    """table_files must scan the snapshot's .files metadata table and
    return file_path values in order."""
    from fsst_spark.sources import tables

    monkeypatch.setattr(tables, "iceberg_available", lambda s: True)
    rows = [{"file_path": "s3://b/data/f1.parquet"},
            {"file_path": "s3://b/data/f2.parquet"}]
    fake = _FakeSpark(rows)
    files = tables.table_files(fake, "iceberg:cat.db.pages")
    assert files == ["s3://b/data/f1.parquet", "s3://b/data/f2.parquet"]
    assert fake.read.calls == [
        ("format", "iceberg"),
        ("load", "cat.db.pages.files"),
        ("select", ("file_path",)),
        ("orderBy", ("file_path",)),
        ("collect",),
    ]


def test_encode_files_batched_matches_single_run(spark, tmp_path):
    """Batched submission over a lazily-consumed listing must produce the
    same store as one un-batched run: contiguous pids, all files encoded,
    resume state interchangeable."""
    from pyspark.sql import functions as F

    from fsst_spark.jobs.decode import decode_job
    from fsst_spark.jobs.encode import completed_pids, encode_files_batched
    from fsst_spark.sources import table_files

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"))
    src = str(tmp_path / "src")
    df.repartition(9).write.parquet(src)
    files = table_files(spark, src)
    assert len(files) == 9

    pulled = []

    def listing():  # lazy: records consumption order
        for f in files:
            pulled.append(f)
            yield f

    out = str(tmp_path / "enc")
    metrics = encode_files_batched(spark, out, files=listing(),
                                   batch_files=4)
    assert pulled == files
    assert len(metrics) == 9
    assert completed_pids(out) == set(range(9))
    fp = F.sum(F.pmod(F.xxhash64("doc_id", "text"), F.lit(1 << 31)))
    assert decode_job(spark, out).agg(fp).first()[0] == df.agg(fp).first()[0]

    # re-run resumes: nothing left to encode
    assert encode_files_batched(spark, out, files=iter(files),
                                batch_files=4) == []


def test_table_files_iter_local_matches_list(spark, tmp_path):
    from pyspark.sql import functions as F

    from fsst_spark.sources import table_files
    from fsst_spark.sources.tables import table_files_iter

    src = str(tmp_path / "src")
    spark.range(50).select(F.col("id").alias("doc_id")) \
        .repartition(3).write.parquet(src)
    assert list(table_files_iter(spark, src)) == table_files(spark, src)
