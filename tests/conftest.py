from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ta2_minmod_kg_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
