from __future__ import annotations

import pytest

from vector_database_product_recommendation_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vdb-rec-tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
