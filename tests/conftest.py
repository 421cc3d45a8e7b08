import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sea_serpent_spark.session import get_spark

    s = get_spark(app_name="sea-serpent-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    from sea_serpent_spark import Table

    return Table.from_parquet(f"{sf_dir}/lineitem.parquet", "lineitem", spark)


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    from sea_serpent_spark import Table

    return Table.from_parquet(f"{sf_dir}/orders.parquet", "orders", spark)


@pytest.fixture(scope="session")
def customer(spark, sf_dir):
    from sea_serpent_spark import Table

    return Table.from_parquet(f"{sf_dir}/customer.parquet", "customer", spark)
