from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from temporai_mivdp_spark.session import get_test_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    session = get_test_session(cpus=4)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)
