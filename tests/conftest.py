import shutil
import tempfile

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from incubator_paimon_spark import get_spark
    s = get_spark("tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def warehouse():
    wh = tempfile.mkdtemp(prefix="pmn_test_")
    yield wh
    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture()
def catalog(warehouse):
    from incubator_paimon_spark import Catalog
    return Catalog(warehouse)


@pytest.fixture(scope="session")
def customer(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet")


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")
