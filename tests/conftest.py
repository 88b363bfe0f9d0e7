import tempfile

import pytest

from big_data_analysis_for_stock_market_data_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="engine_tests",
        master="local[4]",
        shuffle_partitions=4,
        configs={
            # bucketed-table tests use saveAsTable; keep the warehouse out
            # of the repo tree
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="engine_wh_"),
        },
    )
    yield s
