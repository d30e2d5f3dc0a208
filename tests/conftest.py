from __future__ import annotations

import pytest

from spider_man_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "spider_man_spark-tests", master="local[4]", shuffle_partitions=4,
        # saveAsTable tests (bucketed ANN) must not drop a
        # spark-warehouse/ dir into the repo cwd
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="sms_test_wh_")
        },
    )
    yield s
    s.stop()
