from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from nde_crawlers_spark.session import get_spark

    s = get_spark(app_name="nde-tests", cores=16, shuffle_partitions=16)
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
