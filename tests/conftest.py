from __future__ import annotations

import os

import pytest

# data-dependent oracles (plans/data_oracles.py) must be built against the
# same sf dir the local harness registers as DuckDB views — pin it before
# any test imports __spark_entry__ (the driver's own default is sf0.01)
os.environ.setdefault("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ta2_minmod_kg_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
