import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflowtemplates_spark.session import build_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = build_session("tests", master="local[4]", shuffle_partitions=4,
                      extra_confs={"spark.sql.warehouse.dir": wh})
    yield s
    s.stop()
