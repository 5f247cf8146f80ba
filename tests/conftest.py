import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from strategy_analyzer_exporter_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
