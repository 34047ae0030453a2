from __future__ import annotations

import pytest

from trimet_bytes__data_engineering_project_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("trimet-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
