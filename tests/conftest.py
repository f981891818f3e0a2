from __future__ import annotations

import pytest

from pdfmef_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pdfmef_spark_tests", cores=8, shuffle_partitions=16, driver_memory="24g")
    yield s


@pytest.fixture(scope="session")
def smoke_pages(spark):
    """sf0.001-scale pages corpus (500 rows), cached on disk."""
    from pdfmef_spark.sources import store

    return store.read_pages(spark, 0.001)
