from __future__ import annotations

import pytest

from fusus_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fusus-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
