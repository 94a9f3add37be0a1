import os
import sys

import pytest

# tests run from the repo root; make the package importable regardless
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from opencv_table_extraction_spark.session import build_session

    s = build_session(
        app_name="octe-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    from opencv_table_extraction_spark.fixtures.gen import write_fixture

    d = tmp_path_factory.mktemp("fixture")
    write_fixture(str(d), n_turns=2200, seed=42, skew=True)
    return str(d)
