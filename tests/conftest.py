import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nightcrawler_ds_pipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ncds-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def t1_dir(tmp_path_factory):
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    return write_fixture_parquet("t1", str(tmp_path_factory.mktemp("fixtures")))
