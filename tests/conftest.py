from __future__ import annotations

import pytest

from big_data_project_datapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small parallelism for unit tests; same config surface as production.
    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "2g"},
    )
    yield s
