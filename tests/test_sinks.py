"""Sink / file-format coverage: parquet, partitioned parquet, CSV, JSON
round-trips, and the approximate-distinct error bound."""

import os

import pyspark.sql.functions as F

SF_DIR = '/root/testdata/sf0.001'


def test_parquet_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f'{SF_DIR}/documents.parquet')
    out = str(tmp_path / 'docs_out')
    docs.write.mode('overwrite').parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    a = sorted(r.doc_id for r in docs.select('doc_id').collect())
    b = sorted(r.doc_id for r in back.select('doc_id').collect())
    assert a == b


def test_partitioned_parquet_write_prunes(spark, tmp_path):
    """Hive-partitioned layout: partition pruning must skip directories."""
    docs = spark.read.parquet(f'{SF_DIR}/documents.parquet')
    out = str(tmp_path / 'docs_by_lang')
    docs.write.mode('overwrite').partitionBy('lang').parquet(out)
    assert any(d.startswith('lang=') for d in os.listdir(out))
    back = spark.read.parquet(out)
    en = back.filter(F.col('lang') == 'en')
    plan = en._jdf.queryExecution().executedPlan().toString()
    # partition filter present on the scan, not a post-filter on all rows
    assert 'PartitionFilters: [isnotnull(lang' in plan
    expected = docs.filter(F.col('lang') == 'en').count()
    assert en.count() == expected


def test_csv_roundtrip(spark, tmp_path):
    nation = spark.read.parquet(f'{SF_DIR}/nation.parquet')
    out = str(tmp_path / 'nation_csv')
    nation.write.mode('overwrite').option('header', True).csv(out)
    back = (
        spark.read.option('header', True)
        .option('inferSchema', True)
        .csv(out)
    )
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_json_roundtrip(spark, tmp_path):
    region = spark.read.parquet(f'{SF_DIR}/region.parquet')
    out = str(tmp_path / 'region_json')
    region.write.mode('overwrite').json(out)
    back = spark.read.json(out)
    assert back.count() == region.count()
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in region.collect()
    )


def test_approx_count_distinct_error_bound(spark):
    li = spark.read.parquet(f'{SF_DIR}/lineitem.parquet')
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy('l_returnflag')
        .agg(F.count_distinct('l_partkey').alias('n'))
        .collect()
    }
    approx = {
        r.l_returnflag: r.n
        for r in li.groupBy('l_returnflag')
        .agg(F.approx_count_distinct('l_partkey', rsd=0.02).alias('n'))
        .collect()
    }
    for flag, n in exact.items():
        assert abs(approx[flag] - n) / n < 0.1
