import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hazelcast-jet-spark-tests")
    # the driver runs OUR queries in ITS OWN session with unknown configs;
    # test under a hostile (non-UTC) timezone so every tz-dependence shows
    # up here first.  Override with SPARK_GRAFT_TEST_TZ=UTC to compare.
    s.conf.set("spark.sql.session.timeZone",
               os.environ.get("SPARK_GRAFT_TEST_TZ", "America/New_York"))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
