from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from spatialjoin.sparkutil import get_spark

    s = get_spark(cpus=4, app="spatialjoin-tests")
    yield s
    s.stop()
