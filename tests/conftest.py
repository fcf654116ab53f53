from __future__ import annotations

import pytest

from logstash_forwarder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session for fast tests; pipeline code itself never assumes
    # a parallelism level.
    s = get_spark(
        app_name="lfs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path / "out")


# events table schema shared by the streaming/aggregate tests
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
