from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_arcgis_spark.session import get_session  # noqa: E402



@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", shuffle_partitions=4)
    yield s
