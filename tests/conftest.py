import os

import pytest


@pytest.fixture(scope='session')
def spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get('SPARK_GRAFT_CPUS', '4')
    session = (
        SparkSession.builder.master(f'local[{cpus}]')
        .appName('cyclebane-spark-tests')
        .config('spark.sql.shuffle.partitions', '8')
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.ui.enabled', 'false')
        .config('spark.driver.memory', '4g')
        .getOrCreate()
    )
    yield session


@pytest.fixture(scope='session')
def sf_dir():
    return os.environ.get('SPARK_GRAFT_TEST_SF', '/root/testdata/sf0.001')
